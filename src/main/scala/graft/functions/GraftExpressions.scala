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

/** Distinct hashed word n-gram shingles of a text in ONE pass:
  * normalize (lower, trim, whitespace-split) → FNV-1a hash per token →
  * polynomial combine per n-window → distinct. `string` →
  * `array<long>`. Replaces a 5-stage higher-order-function chain
  * (normalize, split, transform+slice+concat_ws, xxhash64 transform,
  * array_distinct) that re-walks the token array per shingle.
  * Fewer than n tokens → a single hash of the whole token list
  * (same degenerate-case semantics as the HOF form). */
case class ShingleHashes64(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0 && n <= 32)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  @inline private def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT).trim
    val tokens =
      if (text.isEmpty) Array.empty[String] else text.split("\\s+")
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (tokens.length < n) {
      // degenerate: one shingle of the whole (possibly empty) text
      var h = 0x9e3779b97f4a7c15L
      var i = 0
      while (i < tokens.length) { h = h * 0x100000001b3L + fnv1a(tokens(i)); i += 1 }
      out.add(h)
    } else {
      val th = new Array[Long](tokens.length)
      var i = 0
      while (i < tokens.length) { th(i) = fnv1a(tokens(i)); i += 1 }
      var s = 0
      while (s + n <= tokens.length) {
        var h = 0x9e3779b97f4a7c15L
        var j = 0
        while (j < n) { h = h * 0x100000001b3L + th(s + j); j += 1 }
        out.add(h)
        s += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): ShingleHashes64 =
    copy(child = c)
}

/** Distinct md5-prefix hashes of the word n-gram shingles in ONE pass
  * (`string` → `array<long>`): the same normalize→tokenize→window walk
  * as [[ShingleHashes64]], but each shingle hashes to the SIGNED 64-bit
  * value of its md5 digest's first 8 bytes (big-endian) — bit-identical
  * to the HOF form `md5 hex → conv(hi)·2³² + conv(lo)` the DuckDB
  * oracles replay (q91/q191/q192/q195/q196), which is the whole point
  * of this family: md5 is replayable by the oracle where FNV is not.
  * The HOF composition (per-shingle slice + concat_ws + md5 hex +
  * two conv substring parses, all interpreted) measured 5.0 s per
  * corpus pass at sf1 vs 0.5 s for the FNV kernel; the digest itself
  * is a fraction of that, so one tight pass recovers most of the gap —
  * and the near-dedup pipeline evaluates this kernel up to 3× per
  * query. Degenerate (< n tokens) case: one shingle of the whole
  * (possibly empty) text, as everywhere in this family. */
case class Md5ShingleHashes64(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0 && n <= 32)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_md5_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  @inline private def md5Long(s: String): Long = {
    val d = Md5ShingleHashes64.digest.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (bytes(i) & 0xffL); i += 1 }
    h
  }

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT).trim
    val tokens =
      if (text.isEmpty) Array.empty[String] else text.split("\\s+")
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (tokens.length < n) {
      out.add(md5Long(tokens.mkString(" ")))
    } else {
      val sb = new java.lang.StringBuilder
      var s = 0
      while (s + n <= tokens.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(tokens(s + j))
          j += 1
        }
        out.add(md5Long(sb.toString))
        s += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): Md5ShingleHashes64 =
    copy(child = c)
}

object Md5ShingleHashes64 {
  /** MessageDigest is stateful and not thread-safe; one per task thread. */
  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}

/** MinHash signature of a hashed-shingle set (`array<long>` →
  * `array<long>` of length k): min over elements of h_i(x) = a_i·x+b_i
  * for k independent affine hash functions with position-seeded
  * (splitmix64) coefficients — identical on every executor, nothing
  * broadcast. One tight pass; the higher-order-function composition of
  * the same idea evaluates k×|shingles| interpreted lambdas per row and
  * is ~100× slower at corpus scale. */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && k <= 1024)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  @transient private lazy val coeffs: (Array[Long], Array[Long]) =
    MinHashSignature.coefficients(k)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val (as, bs) = coeffs
    val out = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var j = 0
      while (j < k) {
        val h = as(j) * x + bs(j)
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    // empty shingle set → the all-MaxValue signature (matches only other
    // empty sets, which is the right semantics for empty documents)
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** Densified ONE-PERMUTATION MinHash signature (Li, Owen & Zhang 2012;
  * Shrivastava & Li 2014's rotation densification): the shingle hash
  * itself is the permuted value — its unsigned residue mod k selects a
  * bin, each bin keeps its (signed) minimum, and an empty bin borrows
  * from the nearest ORIGINALLY non-empty bin to its right (circular),
  * offset by hops·C (C an odd splitmix constant, wraparound arithmetic)
  * so borrowed values collide across docs exactly when the borrowed
  * minimum and hop distance both agree — the rotation scheme's
  * collision property. Cost: O(|shingles| + k) per doc vs classic
  * MinHash's O(k·|shingles|) — at 100 TB the signature stage shrinks
  * k-fold while the banding/verification machinery is unchanged (and
  * exact-Jaccard verification keeps the FINAL pair set exact either
  * way; only candidate recall differs — measured against exact truth
  * in q196). Empty shingle sets signature to all-MaxValue, matching
  * only other empty docs (the [[MinHashSignature]] convention).
  * Bit-replayable: bins, minima and rotation reproduce in DuckDB from
  * the same md5 shingle hashes (q195/q196 oracles). */
case class OphSignature(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && k <= 1024)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_oph_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    val empty = Array.fill(k)(true)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      val bin = java.lang.Long.remainderUnsigned(x, k.toLong).toInt
      if (empty(bin) || x < mins(bin)) { mins(bin) = x; empty(bin) = false }
      i += 1
    }
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      if (!empty(j)) out(j) = mins(j)
      else if (n == 0) out(j) = Long.MaxValue
      else {
        // borrow from the nearest originally non-empty bin rightward
        // (reads `mins`, never densified output — well-defined in any
        // scan order); n > 0 guarantees at least one non-empty bin
        var hops = 1
        var src = (j + 1) % k
        while (empty(src)) { src = (src + 1) % k; hops += 1 }
        out(j) = mins(src) + OphSignature.C * hops // wraparound intended
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): OphSignature =
    copy(child = c)
}

object OphSignature {
  /** Rotation offset constant — public so the q195/q196 DuckDB oracles
    * inline the SAME value (one source of truth, the
    * [[MinHashSignature.coefficients]] discipline). */
  val C: Long = 0x9e3779b97f4a7c15L
}

/** All canonical id pairs of a posting list (`array<long>` →
  * `array<struct<a,b>>`, a < b): sorts the (distinct) ids once, then
  * emits every combination in ascending order. The pair-expansion
  * kernel of the postings-grain containment join ([[graft.operators
  * .Dedup.containmentPairs]]): one exploded output row per UNORDERED
  * co-occurrence, half the df²−df rows the two-sided self-join form
  * shuffles into the pair aggregate. Callers MUST bound the input
  * (df caps): output is C(n,2) structs. */
case class SortedPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_sorted_pairs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ids = new Array[Long](n)
    var i = 0
    while (i < n) { ids(i) = arr.getLong(i); i += 1 }
    java.util.Arrays.sort(ids)
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = org.apache.spark.sql.catalyst.InternalRow(ids(i), ids(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): SortedPairs =
    copy(child = c)
}

/** [[SortedPairs]]' packed fast path (`array<long>` → `array<long>`):
  * each canonical pair (a < b) packs into ONE long `(a << 32) | b`.
  * Output is a primitive long array — no per-pair struct allocation —
  * and the downstream pair-count aggregate keys on a single 8-byte
  * long instead of a 16-byte struct; at 10⁸ distinct pairs per corpus
  * (measured at sf1) that halves the aggregate's key bytes and removes
  * ~10⁸ row allocations per run. REQUIRES every id in [0, 2³¹):
  * callers must check the corpus id range (one scalar max alongside
  * the corpus count) and fall back to [[SortedPairs]] otherwise —
  * [[graft.operators.Dedup.containmentPairs]] does exactly that. */
case class SortedPairsPacked(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sorted_pairs_packed"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ids = new Array[Long](n)
    var i = 0
    while (i < n) { ids(i) = arr.getLong(i); i += 1 }
    java.util.Arrays.sort(ids)
    val out = new Array[Long](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      val hi = ids(i) << 32
      var j = i + 1
      while (j < n) {
        out(k) = hi | ids(j)
        k += 1
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): SortedPairsPacked =
    copy(child = c)
}

object MinHashSignature {
  /** Position-seeded (splitmix64) affine coefficients — public so the
    * q91 DuckDB oracle can inline the SAME constants rather than
    * duplicate the mix (one source of truth for the hash family). */
  def coefficients(k: Int): (Array[Long], Array[Long]) = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val a = Array.tabulate(k)(i => mix(2L * i) | 1L) // odd multiplier
    val b = Array.tabulate(k)(i => mix(2L * i + 1))
    (a, b)
  }
}

/** Column-level accessors (via the classic Expression↔Column shim) and
  * SQL registration for the custom expressions. Registration is
  * idempotent per session and only needed for SQL-text callers —
  * the Column accessors work without it. */
object GraftFunctions {
  import org.apache.spark.sql.graft.shim

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // Idempotence guard: several queries call register() defensively;
    // re-running createOrReplaceTempFunction emits a
    // SimpleFunctionRegistry "replacing function" warning PER function
    // PER query — hundreds of noise lines in a full bench/verify run.
    // One existence probe makes repeat calls a no-op.
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_fingerprint64")))
      return
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
    reg.createOrReplaceTempFunction(
      "graft_nfc", exprs => NormalizeNfc(exprs.head), "built-in")
  }

  /** Rolling-hash fingerprint of a string column. */
  def fingerprint64(c: Column): Column =
    shim.column(Fingerprint64(shim.expression(c)))

  /** SimHash of an array<long> token-hash column. */
  def simhash64(c: Column): Column =
    shim.column(SimHash64(shim.expression(c)))

  /** Unicode NFC canonicalization of a string column. */
  def nfc(c: Column): Column =
    shim.column(NormalizeNfc(shim.expression(c)))
}

/** Unicode NFC normalization (java.text.Normalizer over the JDK's ICU
  * data): composed and decomposed forms of the same text ("café" as
  * U+00E9 vs e+U+0301) hash differently and defeat exact dedup; NFC
  * canonicalizes before hashing. Pure per-row scalar with codegen via
  * the shared static kernel (fast path skips the Normalizer entirely
  * for ASCII — the overwhelming majority of corpus rows). */
case class NormalizeNfc(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeNfc.nfc($c)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    NormalizeNfc.nfc(input.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
}

object NormalizeNfc {
  /** Static kernel shared by eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { ascii = bytes(i) >= 0; i += 1 }
    if (ascii) s // ASCII is NFC by definition — zero-copy fast path
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }
}

/** Content-defined chunk boundaries of a text (the CDC half of
  * substring-level dedup — anchors from Rabin-style rolling hashes, so
  * identical content produces identical chunks at ANY offset in ANY
  * document; fixed-grid chunking would mask repeats that straddle grid
  * lines). `string` → `array<struct<start:int,len:int>>` with 1-based
  * CODE POINT starts, matching SQL `substring` addressing so downstream
  * and the DuckDB oracle slice identically.
  *
  * Definition (shared verbatim with the oracle SQL): over the code
  * points c_1..c_n, position i (1-based, 2 ≤ i ≤ n-w+1) is an anchor
  * iff H(i) % p == 0, where H(i) is the base-B polynomial hash of
  * c_i..c_{i+w-1} mod M (leading term first — equals a left fold of
  * acc·B + c starting from c_i). Chunks span between consecutive
  * boundaries {1} ∪ anchors ∪ {n+1}. One rolling O(n) pass here; the
  * oracle recomputes each window hash directly — same values. */
case class CdcChunks(child: Expression, w: Int, p: Int)
    extends UnaryExpression with CodegenFallback {
  require(w > 1 && w <= 64, "window must be in (1, 64]")
  require(p > 1, "anchor modulus must be > 1")
  import CdcChunks.{B, M}

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("start", IntegerType, nullable = false),
      StructField("len", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // code points, not chars: SQL substring addresses code points in
    // both engines, so boundaries must too
    val codes = s.codePoints().toArray
    val n = codes.length
    val bounds = scala.collection.mutable.ArrayBuffer(0)
    if (n >= w) {
      var h = 0L
      var j = 0
      while (j < w) { h = (h * B + codes(j)) % M; j += 1 }
      // drop the leading term then shift in the next code point:
      // H(i+1) = (H(i) - c_i·B^(w-1))·B + c_{i+w}  (mod M)
      val lead = {
        var x = 1L; var k = 0
        while (k < w - 1) { x = x * B % M; k += 1 }
        x
      }
      var i = 1 // 0-based window start = 1-based anchor position i+1
      while (i <= n - w) {
        h = ((h - codes(i - 1) * lead % M + M) * B + codes(i + w - 1)) % M
        if (h % p == 0) bounds += i
        i += 1
      }
    }
    bounds += n
    val rows = new Array[Any](bounds.length - 1)
    var k = 0
    while (k < rows.length) {
      rows(k) = org.apache.spark.sql.catalyst.InternalRow(
        bounds(k) + 1, bounds(k + 1) - bounds(k))
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override protected def withNewChildInternal(c: Expression): CdcChunks =
    copy(child = c)
}

object CdcChunks {
  /** Polynomial base / modulus — small enough that every intermediate
    * fits a long with room for the +M de-negation, large enough that
    * anchor selection is effectively uniform. MUST match the oracle
    * SQL's constants verbatim. */
  val B = 31L
  val M = 1000003L
}

/** Bloom-membership probe of a BIGINT column against a driver-built
  * filter — the streaming twins' per-batch gate.
  *
  * Spark's own `BloomFilterMightContain` takes the SERIALIZED filter as
  * a child expression, and the twins fed it a ~1 MB byte-array Literal.
  * `Literal.hashCode` overrides (and so bypasses) TreeNode's cached
  * hash, so every parent-node rehash during analysis / optimization /
  * AQE re-ran `Arrays.hashCode` over the megabyte — measured r19 as
  * multi-second, corpus-independent driver stalls that grew with plan
  * size (jstack: the main thread pinned in Literal.hashCode inside
  * TreeNode hashing), and every stage's task binary re-shipped the
  * megabyte. Here the DESERIALIZED filter rides in a SECOND (curried)
  * constructor list — outside the case-class fields, so tree
  * equality/hash touch only (probeId, child) — and codegen references
  * the filter object through the references array. `probeId` is a
  * JVM-unique id standing in for the filter's identity: two probes are
  * semantically equal iff they hold the same filter instance, which is
  * exactly the per-batch fold-reuse case.
  *
  * The filter object is immutable once built (fold/aggregate completes
  * before any plan that probes it runs), and BloomFilterImpl is
  * java-Serializable, so the reference ships in the task binary ONCE
  * per stage on a real cluster. */
case class BloomProbe(probeId: Long, child: Expression)(
    val filter: org.apache.spark.util.sketch.BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_probe"

  // makeCopy/withNewChildInternal must re-supply the curried argument
  override def otherCopyArgs: Seq[AnyRef] = filter :: Nil

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val bf = ctx.addReferenceObj("graftBloom", filter,
      "org.apache.spark.util.sketch.BloomFilter")
    defineCodeGen(ctx, ev, c => s"$bf.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)(filter)
}

object BloomProbe {
  private val ids = new java.util.concurrent.atomic.AtomicLong()

  /** Probe column over a deserialized filter (deserialize ONCE per
    * batch and reuse the returned object across every probe site —
    * each call mints a distinct semantic identity). */
  def apply(filter: org.apache.spark.util.sketch.BloomFilter,
      elem: Column): Column = {
    import org.apache.spark.sql.graft.shim
    shim.column(BloomProbe(ids.incrementAndGet(), shim.expression(elem))(filter))
  }

  def deserialize(bytes: Array[Byte]): org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(bytes))
}
