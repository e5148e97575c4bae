package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` installer for the engine's custom Catalyst
  * expressions, so deployments can opt in via configuration alone:
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * makes `graft_fingerprint64`, `graft_simhash64`, `graft_cosine`,
  * `graft_dot`, `graft_hyperplane_sig` available to pure-SQL users on
  * every session of the cluster — no code changes. Programmatic callers
  * can use [[graft.functions.GraftFunctions.register]] (session-scoped)
  * or the Column accessors (no registration needed).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer rule: DISTINCT-over-windowed-aggregate → groupBy
    // aggregate (the reference's Task 8/10/11 anti-pattern, SURVEY §4.3)
    ext.injectOptimizerRule(_ => graft.plans.RewriteWindowedDistinctAgg)
    ext.injectFunction((
      FunctionIdentifier("graft_fingerprint64"),
      info("graft_fingerprint64", "graft_fingerprint64(str) - 64-bit rolling fingerprint"),
      (exprs: Seq[Expression]) => Fingerprint64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "graft_simhash64(array<bigint>) - simhash of token hashes"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(vec, vec) - cosine similarity"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(vec, vec) - dot product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hyperplane_sig"),
      info("graft_hyperplane_sig", "graft_hyperplane_sig(vec, planes) - LSH signature"),
      (exprs: Seq[Expression]) => HyperplaneSignature(
        exprs(0), exprs(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      info("graft_nfc", "graft_nfc(str) - Unicode NFC canonicalization"),
      (exprs: Seq[Expression]) => NormalizeNfc(exprs.head)))
  }
}
