package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The full corpus-curation chain as a reusable JOB BODY — the
  * RefinedWeb sequence the q203 catalog entry proves correct, packaged
  * so `run.PipelineMain curate` can emit the trainer-consumable corpus
  * (curated parquet + a one-row stats artifact) instead of just a query
  * result:
  *
  *   near-dedup keeper election (MinHash-LSH, q91's kernel)
  *     → containment pruning over the DEDUPED corpus (q191's sequencing
  *       — replica cliques never reach the pair stage)
  *     → cross-document span scrub of the survivors (q197)
  *
  * Each stage shrinks the next stage's pair/ban volume; all three reuse
  * the [[graft.operators.Dedup]] operators whose scale shapes are
  * documented in SCALING.md. The q203 oracle staples the three replay
  * chains under one hash, and `CurationChainSpec` asserts the job-body
  * output equals the catalog query result bit-for-bit.
  *
  * The STREAMING twin ([[curateLanded]]) picks up where
  * [[graft.streaming.StreamPipeline.dedupStreamWithIndex]] lands its
  * exact-dedup survivors: the online stage dedups at ingest against the
  * at-rest hash index, and the nightly batch runs the pair-level stages
  * (containment + scrub) over the committed landing — the
  * stream-then-batch split a production ingest actually uses, because
  * containment needs corpus-global document frequencies no online pass
  * has. */
object CurationChain {

  /** Batch chain: documents in, scrubbed export out — one row per
    * surviving doc: (idCol, text_scrubbed, n_chunks, n_removed).
    * Defaults match the q203 catalog entry exactly. */
  def curate(
      docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5,
      shingleHasher: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column =
        graft.functions.TextFunctions.md5ShingleHashes,
      ngram: Int = 3, maxDfShare: Int = 15, minContainmentFp: Long = 13108L,
      chunkTokens: Int = 10, minDocs: Int = 2): DataFrame = {
    val finalKept = prunedKeepers(docs, idCol, textCol, shingleSize,
      numHashes, bands, threshold, shingleHasher, ngram, maxDfShare,
      minContainmentFp)
    graft.operators.Dedup.chunkScrub(docs.join(finalKept, idCol),
      idCol, textCol, chunkTokens = chunkTokens, minDocs = minDocs)
  }

  /** Stages 1+2 shared by both scrub variants: near-dedup keeper
    * election, then containment pruning over the deduped corpus. */
  private def prunedKeepers(
      docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, numHashes: Int, bands: Int, threshold: Double,
      shingleHasher: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column,
      ngram: Int, maxDfShare: Int, minContainmentFp: Long): DataFrame = {
    val D = graft.operators.Dedup
    val kept = D.minhashLsh(docs, idCol, textCol,
        shingleSize, numHashes, bands, threshold,
        shingleHasher = shingleHasher)
      .filter(!col("is_duplicate")).select(col(idCol))
    val contained = D.containmentPairs(
        docs.join(kept, idCol), idCol, textCol,
        ngram = ngram, maxDfShare = maxDfShare,
        minContainmentFp = minContainmentFp)
      .select(col("inner_id").as(idCol)).distinct()
    kept.join(contained, Seq(idCol), "left_anti")
  }

  /** [[curate]] with the ALL-ALIGNMENT scrub stage: near-dedup and
    * containment pruning as above, then
    * [[graft.operators.Dedup.exactSubstrScrub]] (q214) instead of the
    * fixed-grid [[graft.operators.Dedup.chunkScrub]] (q197) — the
    * keep-one-copy cut of every cross-document `window`-token repeat,
    * at ANY token offset. Closes the export gap the r17 verdict named:
    * a duplicate straddling the chunk grid passes chunkScrub and
    * shipped in the q203 export; here it is cut from every doc but the
    * keeper (CurationChainSpec plants exactly that corpus). Output is
    * token-space: (idCol, text_scrubbed, n_tokens, n_removed).
    *
    * `withinDoc = true` switches the scrub stage to
    * [[graft.operators.Dedup.exactSubstrScrubAll]] (q215): the census
    * then also catches a document repeating its OWN boilerplate — the
    * r18 verdict's residual gap, where the cross-doc-only census
    * shipped a keeper's internal repeats N times — keeping one
    * first-occurrence copy of every ≥ `window`-token repeat anywhere
    * in the corpus. */
  def curateSubstr(
      docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5,
      shingleHasher: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column =
        graft.functions.TextFunctions.md5ShingleHashes,
      ngram: Int = 3, maxDfShare: Int = 15, minContainmentFp: Long = 13108L,
      window: Int = 16, minDocs: Int = 2,
      withinDoc: Boolean = false): DataFrame = {
    val finalKept = prunedKeepers(docs, idCol, textCol, shingleSize,
      numHashes, bands, threshold, shingleHasher, ngram, maxDfShare,
      minContainmentFp)
    val pruned = docs.join(finalKept, idCol)
    if (withinDoc)
      graft.operators.Dedup.exactSubstrScrubAll(pruned,
        idCol, textCol, window = window, minCopies = minDocs)
    else
      graft.operators.Dedup.exactSubstrScrub(pruned,
        idCol, textCol, window = window, minDocs = minDocs)
  }

  /** Streaming-twin batch half: containment + scrub over the committed
    * landing of [[graft.streaming.StreamPipeline.dedupStreamWithIndex]]
    * (exact-dedup survivors in IdempotentSink batch=N dirs). Reads ONLY
    * _SUCCESS-marked batches — a torn batch from a mid-write crash is
    * invisible, the same replay discipline the ingest itself uses. */
  def curateLanded(
      spark: SparkSession, landedBase: String, idCol: String,
      textCol: String): DataFrame = {
    val committed =
      graft.streaming.IdempotentSink.committedDirs(spark, landedBase)
    require(committed.nonEmpty, s"no committed batches under $landedBase")
    val docs = spark.read.parquet(committed: _*)
      .select(col(idCol), col(textCol))
    val D = graft.operators.Dedup
    val contained = D.containmentPairs(docs, idCol, textCol,
        ngram = 3, maxDfShare = 15, minContainmentFp = 13108L)
      .select(col("inner_id").as(idCol)).distinct()
    D.chunkScrub(docs.join(contained, Seq(idCol), "left_anti"),
      idCol, textCol, chunkTokens = 10, minDocs = 2)
  }

  /** One-row stats artifact over a LANDED curated export (read back
    * from parquet so the chain is never re-evaluated): input size,
    * export size, and scrub totals — the numbers a corpus release note
    * carries. Works over either scrub grain; the `grain` column names
    * the unit explicitly (ADVICE r18: chunk-named totals holding token
    * counts forced out-of-band knowledge of which chain wrote the
    * artifact) — 'chunks' for [[curate]], 'tokens' for
    * [[curateSubstr]]. The total column names stay fixed so existing
    * consumers keep parsing. */
  def stats(nInput: Long, curated: DataFrame): DataFrame = {
    val unit = if (curated.columns.contains("n_chunks")) "n_chunks" else "n_tokens"
    curated.agg(
      lit(nInput).as("n_input"),
      count(lit(1)).as("n_exported"),
      sum(col(unit)).as("chunks_total"),
      sum(col("n_removed")).as("chunks_removed"),
      lit(if (unit == "n_chunks") "chunks" else "tokens").as("grain"))
  }
}
