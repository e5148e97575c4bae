package graft.pipeline

import graft.{SparkSpec, SparkEntry, Tables}
import graft.streaming.StreamPipeline
import org.apache.spark.sql.functions._

/** The curation chain as a PRODUCT: the runnable job
  * (`PipelineMain curate`) must emit exactly what the q203 catalog
  * entry proves correct, and the stream-then-batch split
  * (dedupStreamWithIndex ingest → curate-landed nightly) must converge
  * to the batch chain on corpora whose duplicates are exact. */
class CurationChainSpec extends SparkSpec {
  import spark.implicits._

  test("PipelineMain curate job body equals the q203 catalog result") {
    val sf = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft-curate").toString
    val docs = graft.operators.Fanout.forKernel(
      Tables.load(spark, sf, "documents"))
    graft.run.PipelineMain.runCurate(spark, docs.count(),
      CurationChain.curate(docs, "doc_id", "text"), out)
    val landed = spark.read.parquet(s"$out/curated")
    val q203 = SparkEntry.queries("q203_curated_scrub_export")(spark, sf)
    assertSameRows(landed, q203, "landed export vs catalog query")
    // the stats artifact describes the landed files, not a re-run
    val stats = spark.read.json(s"$out/stats").collect()
    assert(stats.length == 1)
    val r = stats.head
    assert(r.getAs[Long]("n_exported") == landed.count(),
      s"stats must count the export: $r")
    assert(r.getAs[Long]("chunks_removed") ==
      landed.agg(sum("n_removed")).head().getLong(0))
    assert(r.getAs[Long]("n_input") == docs.count())
  }

  test("streaming ingest + nightly curate-landed converges to the batch chain") {
    // duplicates are EXACT and first arrivals carry the minimum id, so
    // the online exact-dedup stage elects the same keepers the batch
    // minhash stage does — the two chains must then agree bit-for-bit.
    // Docs 1 and 3 share one 10-token span sitting ON the scrub grid
    // (prefixes are exactly 30 tokens — chunkScrub chunks a fixed
    // grid, so an unaligned span would land in different chunks and
    // never ban), but stay far below the 0.5 jaccard bar otherwise.
    val span = "shared boilerplate span of exactly ten tokens right here now"
    val d1 = "alpha document with plenty of distinct words about rivers mountains " +
      "valleys forests deserts glaciers canyons plateaus meadows swamps lagoons tundras " +
      s"prairies cliffs dunes caves fjords geysers islands peninsulas archipelagos volcanoes $span " +
      "estuaries deltas basins ridges summits foothills slopes craters mesas buttes"
    val d3 = "totally different second text concerning music harmony rhythm melody tempo " +
      "chords scales notation performance practice dynamics articulation phrasing cadence counterpoint " +
      s"orchestration timbre resonance acoustics improvisation composition arrangement conducting ensembles recitals $span " +
      "sonatas symphonies concertos preludes nocturnes etudes ballades waltzes mazurkas fugues"
    val batch0 = Seq((1L, d1), (2L, d1), (3L, d3))
    val batch1 = Seq(
      (4L, d1),
      (5L, "a third unrelated piece on cooking techniques braising roasting searing simmering seasoning plating garnish presentation"))
    val out = java.nio.file.Files.createTempDirectory("graft-cl-out").toString
    val idx = java.nio.file.Files.createTempDirectory("graft-cl-idx").toString + "/index"
    StreamPipeline.dedupIndexBatch(
      batch0.toDF("doc_id", "text"), 0L, "doc_id", "text", out, idx)
    StreamPipeline.dedupIndexBatch(
      batch1.toDF("doc_id", "text"), 1L, "doc_id", "text", out, idx)
    val nightly = CurationChain.curateLanded(spark, out, "doc_id", "text")
    val ref = CurationChain.curate(
      (batch0 ++ batch1).toDF("doc_id", "text"), "doc_id", "text")
    assertSameRows(nightly, ref, "stream-then-batch vs batch chain")
    // sanity: the exact dups are gone, the shared span is scrubbed
    val byId = nightly.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text_scrubbed"))
      .toMap
    assert(byId.keySet == Set(1L, 3L, 5L), s"keepers: ${byId.keySet}")
    assert(!byId(1L).contains("boilerplate") && !byId(3L).contains("boilerplate"),
      s"shared span must be scrubbed: $byId")
  }
}
