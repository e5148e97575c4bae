package graft.queries

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring (round 12): the
  * perplexity-style quality filter (CCNet/Gopher's "KenLM score" slot)
  * as exact integer dataflow. A bigram model is trained on the corpus
  * itself, each document is scored by its average bigram surprisal,
  * and because the arithmetic is the same 16-fractional-bit log2
  * construction as BM25 (q164), the DuckDB oracle replays every score
  * bit-for-bit — no float drift, no rows-only concession.
  */
object Lm {

  private val tokensSql: String =
    """string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')"""

  /** DuckDB twin of TextFunctions.shingles over alias `t` (the
    * Analytics.shinglesSql convention). */
  private def shinglesSql(n: Int): String = s"""
    CASE WHEN len(t) < $n THEN [array_to_string(t, ' ')]
         ELSE list_transform(generate_series(1, len(t) - ${n - 1}),
                p -> array_to_string(t[p:p+${n - 1}], ' ')) END"""

  private def log2FpSql(x: String): String = {
    val msb = s"(length(bin(CAST($x AS BIGINT))) - 1)"
    val pow = s"(CAST(1 AS BIGINT) << $msb)"
    s"(CAST($msb AS BIGINT) * 65536 + ((($x) - $pow) * 65536) // $pow)"
  }

  def specs: Seq[QuerySpec] = Seq(

    // ---- q165: bigram-LM document surprisal — train add-1-smoothed
    // conditional bigram probabilities on the corpus, score every
    // document by its average surprisal
    //   s(w1 w2) = log2((c(w1·) + V) / (c(w1 w2) + 1))   [fp, ≥ 0]
    //   ppl_fp(doc) = Σ s over the doc's bigrams div n_bigrams
    // (ppl_fp IS log2-perplexity at 16 fractional bits — high = text
    // the corpus LM finds improbable, the CCNet quality signal).
    // Scale shape: surprisal is computed once per DISTINCT bigram at
    // vocab²-grain (counts + prefix totals joined by first token —
    // both vocabulary-grain tables), then ONE keyed shuffle join maps
    // doc bigrams onto their surprisal; document text never moves
    // after tokenize. The vocab-size scalar rides as a 1-row broadcast
    // (q20 pattern). Docs shorter than 2 tokens have no bigrams and
    // are excluded on both sides. ----
    QuerySpec(
      "q165_bigram_lm_quality",
      Some(s"""
        WITH toks AS (
          SELECT doc_id, $tokensSql AS t FROM documents),
        bg AS (
          SELECT doc_id, unnest(${shinglesSql(2)}) AS bigram
          FROM toks WHERE len(t) >= 2),
        cnt AS (
          SELECT bigram, COUNT(*) AS c FROM bg GROUP BY bigram),
        pfx AS (
          SELECT string_split(bigram, ' ')[1] AS w1,
                 CAST(SUM(c) AS BIGINT) AS cp
          FROM cnt GROUP BY 1),
        voc AS (
          SELECT COUNT(DISTINCT token) AS v
          FROM (SELECT unnest(t) AS token FROM toks)),
        surp AS (
          SELECT cnt.bigram,
                 ${log2FpSql("cp + v")} - ${log2FpSql("c + 1")} AS s_fp
          FROM cnt
          JOIN pfx ON pfx.w1 = string_split(cnt.bigram, ' ')[1]
          CROSS JOIN voc)
        SELECT bg.doc_id, COUNT(*) AS n_bigrams,
               CAST(SUM(s_fp) AS BIGINT) // COUNT(*) AS ppl_fp
        FROM bg JOIN surp ON surp.bigram = bg.bigram
        GROUP BY bg.doc_id"""),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val toks = docs.select(col("doc_id"),
          graft.functions.TextFunctions.tokens(col("text")).as("t"))
        // materialized once: the doc-bigram table feeds both the model
        // (counts -> surprisal) and the scoring join — unpersisted, the
        // text scan + tokenize + explode re-runs per consumer
        val bg = docs
          .filter(size(graft.functions.TextFunctions.tokens(col("text"))) >= 2)
          .select(col("doc_id"),
            explode(graft.functions.TextFunctions.shingles(col("text"), 2)).as("bigram"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // populated before the counts/scoring fan-out (cold-cache race:
        // two references in one action re-tokenize the corpus). The
        // cache-write pass costs more than the duplicated tokenize at
        // small scale (sf0.1 min 1.44 -> 1.78 s) but wins once the
        // corpus dominates (sf1 3.99 -> 2.73 s, min of 5) — the
        // recompute grows with data while the extra pass amortizes.
        bg.count()
        val cnt = bg.groupBy("bigram").agg(count(lit(1)).as("c"))
        val pfx = cnt
          .groupBy(split(col("bigram"), " ").getItem(0).as("w1"))
          .agg(sum("c").as("cp"))
        val voc = toks.select(explode(col("t")).as("token"))
          .agg(countDistinct("token").as("v"))
        val surp = cnt
          .join(pfx, split(col("bigram"), " ").getItem(0) === col("w1"))
          .crossJoin(broadcast(voc))
          .selectExpr("bigram",
            s"${graft.operators.Search.log2FpExpr("cp + v")} - " +
              s"${graft.operators.Search.log2FpExpr("c + 1")} AS s_fp")
        bg.join(surp, "bigram")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum("s_fp").as("sum_fp"))
          .selectExpr("doc_id", "n_bigrams", "sum_fp div n_bigrams AS ppl_fp")
      })
  )
}
