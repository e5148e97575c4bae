package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the operators Spark's built-ins can't
  * express in one pass (SURVEY.md §7.3 preference order: built-ins →
  * custom Expression → custom plan). Both are single-pass per-row
  * scalars, so they distribute trivially and add no shuffle.
  */

/** 64-bit rolling polynomial fingerprint of a string (document
  * fingerprinting): h = Σ byte_i · 31^(n-i) over the UTF-8 bytes, with
  * natural wrap-around. Equivalent semantics to an incremental
  * Rabin-Karp-style fingerprint; one pass, no allocation. */
case class Fingerprint64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint64"

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fingerprint64.hashUtf8($c)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    Fingerprint64.hashUtf8(input.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

object Fingerprint64 {
  /** Static kernel shared by eval and generated code. */
  def hashUtf8(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = 31 * h + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }
}

/** SimHash of a bag of 64-bit token hashes (`array<long>` → `long`).
  * For each of the 64 bit positions, votes +1/−1 per token hash bit and
  * keeps the sign — near-duplicate texts differ in few bits, so Hamming
  * distance on the output approximates token-set similarity. Single pass
  * over the array per row (vs. 64 passes if composed from higher-order
  * built-ins). */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Column-level accessors (via the classic Expression↔Column shim) and
  * SQL registration for the custom expressions. Registration is
  * idempotent per session and only needed for SQL-text callers —
  * the Column accessors work without it. */
object GraftFunctions {
  import org.apache.spark.sql.graft.shim

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_fingerprint64", exprs => Fingerprint64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_simhash64", exprs => SimHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_cosine", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_hyperplane_sig", exprs => HyperplaneSignature(
        exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
  }

  /** Rolling-hash fingerprint of a string column. */
  def fingerprint64(c: Column): Column =
    shim.column(Fingerprint64(shim.expression(c)))

  /** SimHash of an array<long> token-hash column. */
  def simhash64(c: Column): Column =
    shim.column(SimHash64(shim.expression(c)))
}
