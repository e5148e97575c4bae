package graft.queries

import graft.{QuerySpec, Tables}
import graft.functions.{GraftFunctions, TextFunctions => T}
import org.apache.spark.sql.functions._

/** Fused signal passes — what a 100 TB pipeline actually schedules.
  *
  * Running q32/q33/q35/q36 as separate jobs scans the corpus once per
  * signal; the nightly build computes EVERY per-document signal in one
  * scan and writes a single signals table. q126 is that pass: all four
  * kernels (token stats, quality metrics, lang-id, fingerprint) in one
  * projection — zero exchanges, one corpus read, whole-stage-codegen
  * keeps the kernels in one generated loop. Its oracle is composed at
  * runtime from the member queries' own oracle SQL (joined on doc_id),
  * so the fused pass is hash-checked against exactly the semantics the
  * individual passes already proved.
  */
object Fused {

  private def oracleOf(name: String): String =
    TextAnalysis.specs.find(_.name == name)
      .flatMap(_.oracle)
      .getOrElse(sys.error(s"no oracle for $name"))

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q126_fused_signal_pass",
      Some(s"""
        SELECT a.doc_id, a.n_chars, a.n_tokens, a.avg_token_len,
               a.alpha_ratio, a.punct_ratio, a.stopword_ratio,
               a.quality_score, b.lang_pred, c.fingerprint
        FROM (${oracleOf("q33_quality_score")}) a
        JOIN (${oracleOf("q35_lang_id")}) b USING (doc_id)
        JOIN (${oracleOf("q36_fingerprint")}) c USING (doc_id)"""),
      (s, dir) => {
        GraftFunctions.register(s)
        graft.operators.Fanout.forKernel(Tables.load(s, dir, "documents"))
          .select(col("doc_id"),
            T.qualityMetrics(col("text")).as("m"),
            T.langId(col("text")).as("lang_pred"),
            GraftFunctions.fingerprint64(T.normalizeText(col("text")))
              .as("fingerprint"))
          .select(col("doc_id"), col("m.*"), col("lang_pred"), col("fingerprint"))
      })
  )
}
