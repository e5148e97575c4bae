package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-batch cost of the streaming index twins as the landed corpus
  * grows (the r16 weak item's "done" criterion: probe time FLAT in
  * batch count). Drives N micro-batches through the foreachBatch
  * bodies directly, and prints ONE JSON line with per-batch wall times
  * plus a head/tail summary.
  *
  * Batches are FRESH documents by default — the common production
  * case, and the zero-positive fast path's best case. `dupPct` > 0
  * makes that share of each batch replicate content from the PREVIOUS
  * batch's fresh docs, so the bloom-positive branch (the one remaining
  * corpus-proportional term, paid per duplicate-bearing batch) is
  * measured instead of argued (VERDICT r17 item 5): every batch then
  * has real positives, the fast path never fires, and the anti-join
  * against the committed index runs every batch.
  *
  * Modes:
  *  - `dedup`  — [[graft.streaming.StreamPipeline.dedupIndexBatch]]
  *    (sidecar-folded bloom, zero-positive fast path, generation
  *    compaction);
  *  - `split`  — [[graft.streaming.StreamPipeline.splitIndexBatch]]
  *    (same, both probe domains);
  *  - `legacy` — the r16 shape, inlined here as the measured baseline:
  *    full committed-index read + per-batch BloomFilterAggregate
  *    rebuild, flat batch=N layout with no sidecars or compaction.
  *
  * Usage: runMain graft.run.StreamStateBench [mode] [nBatches] [docsPerBatch] [dupPct]
  */
object StreamStateBench {
  def main(args: Array[String]): Unit = {
    val mode = if (args.length > 0) args(0) else "dedup"
    val nBatches = if (args.length > 1) args(1).toInt else 50
    val perBatch = if (args.length > 2) args(2).toInt else 2000
    val dupPct = if (args.length > 3) args(3).toInt else 0
    // head is batches 2..6, tail the last 5: fewer than 12 batches
    // would mix warmup into the comparison or leave the head slice
    // empty (mean of zero rows → NaN → invalid JSON; ADVICE r17)
    require(nBatches >= 12, s"need nBatches >= 12 for a valid head/tail split, got $nBatches")
    require(dupPct >= 0 && dupPct <= 50, s"dupPct must be 0..50, got $dupPct")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // shuffle-state reclamation matching Bench.scala: 50 batches of
      // multi-join plans in one JVM leak shuffle files until the
      // ContextCleaner GCs their RDDs (hourly by default — never
      // within a run); without this the late batches measure
      // accumulated-state pressure, not the operator
      .config("spark.cleaner.periodicGC.interval", "1min")
      // split-size floor matching Bench.scala: a freshly compacted
      // index is ONE ~tens-of-MB dir — at the default 128 MiB
      // maxPartitionBytes it scans on a single core and every
      // post-compaction batch serializes its index reads (measured as
      // a 2x per-batch level shift at each compaction point). At
      // production scale the default is right (the compacted index is
      // thousands of 128 MiB splits); this sizes splits to the bench.
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PART_BYTES", s"${4 * 1024 * 1024}"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft-ssb").toString
    val out = s"$root/out"
    val idx = s"$root/index"
    // every token carries a CONTENT id: position i >= nDup in batch b
    // is fresh forever (content id = b*perBatch + i, unique); position
    // i < nDup replicates the content of the previous batch's fresh
    // position nDup + (i mod (perBatch - nDup)) — an exact duplicate
    // of an INDEXED doc, so it is bloom-positive and must be dropped
    // by the index anti-join. doc_ids stay globally unique.
    def docsFor(b: Int): DataFrame = {
      val base = b.toLong * perBatch
      val nDup = perBatch * dupPct / 100
      val cid =
        if (b == 0 || nDup == 0) col("id") + lit(base)
        else when(col("id") < nDup,
            lit(base - perBatch + nDup) + pmod(col("id"), lit(perBatch - nDup)))
          .otherwise(col("id") + lit(base))
      val toks = (0 until 24).map(j => concat(lit(s"w${j}x"), cid.cast("string")))
      spark.range(perBatch).select((col("id") + lit(base)).as("doc_id"),
        concat_ws(" ", toks: _*).as("text"))
    }
    val rows = (0 until nBatches).map { b =>
      val docs = docsFor(b)
      val t0 = System.nanoTime()
      mode match {
        case "dedup" =>
          graft.streaming.StreamPipeline.dedupIndexBatch(
            docs, b.toLong, "doc_id", "text", out, idx)
        case "split" =>
          graft.streaming.StreamPipeline.splitIndexBatch(
            docs, b.toLong, "doc_id", "text", out, idx)
        case "legacy" =>
          val index = graft.streaming.IndexState.read(spark, idx, "h STRING")
          val survivors = graft.operators.Dedup.dedupIncremental(
            docs, "doc_id", "text", index, "h")
          graft.streaming.IdempotentSink.writeBatch(out)(survivors, b.toLong)
          graft.streaming.IdempotentSink.writeBatch(idx)(
            survivors.select(col("content_hash").as("h")), b.toLong)
        case other => sys.error(s"unknown mode $other")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val dirs = graft.streaming.IndexState.committedData(spark, idx).size
      (b, sec, dirs)
    }
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    // head skips the first two batches (JIT/codegen warmup)
    val head = mean(rows.slice(2, 7).map(_._2))
    val tail = mean(rows.takeRight(5).map(_._2))
    val batchesJson = rows.map { case (b, s, d) =>
      f"""{"b":$b,"sec":$s%.4f,"dirs":$d}"""
    }.mkString("[", ",", "]")
    println(
      f"""{"metric":"stream_state","mode":"$mode","n_batches":$nBatches,""" +
      f""""docs_per_batch":$perBatch,"dup_pct":$dupPct,"head_mean_sec":$head%.4f,""" +
      f""""tail_mean_sec":$tail%.4f,"tail_over_head":${tail / head}%.3f,""" +
      s""""batches":$batchesJson}""")
    spark.stop()
  }
}
