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

  test("curateSubstr removes the boundary-straddling duplicate the chunk-grid export ships") {
    // The r17 verdict's gap, end to end: two docs share a 16-token run
    // at offsets 5 and 9 — OFF the 10-token chunk grid, so q203's
    // chunkScrub stage bans nothing and the copy ships twice in the
    // curated export. The docs are otherwise disjoint (jaccard far
    // below 0.5, no containment), so both survive stages 1+2 of BOTH
    // chains; only the scrub stage differs.
    val shared = (0 until 16).map(i => s"dup$i")
    val dA = ((0 until 5).map(i => s"ar$i") ++ shared ++
      (0 until 14).map(i => s"at$i")).mkString(" ")
    val dB = ((0 until 9).map(i => s"br$i") ++ shared ++
      (0 until 10).map(i => s"bt$i")).mkString(" ")
    val fillers = (0 until 4).map(k =>
      (10L + k, (0 until 30).map(i => s"fill${k}x$i").mkString(" ")))
    val docs = (Seq((1L, dA), (2L, dB)) ++ fillers).toDF("doc_id", "text")
    val grid = CurationChain.curate(docs, "doc_id", "text")
      .select("doc_id", "text_scrubbed", "n_removed")
      .as[(Long, String, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(grid.keySet == Set(1L, 2L, 10L, 11L, 12L, 13L),
      s"all docs must survive stages 1+2: ${grid.keySet}")
    assert(grid(1L)._2 == 0L && grid(2L)._2 == 0L &&
      grid(1L)._1.contains("dup5") && grid(2L)._1.contains("dup5"),
      s"fixture must defeat the grid scrub (copy ships twice): $grid")
    val substr = CurationChain.curateSubstr(docs, "doc_id", "text")
      .select("doc_id", "text_scrubbed", "n_tokens", "n_removed")
      .as[(Long, String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(substr.keySet == grid.keySet, "same survivors, different scrub")
    assert(substr(1L)._3 == 0L && substr(1L)._1.contains("dup5"),
      s"keeper keeps its copy: ${substr(1L)}")
    assert(substr(2L)._3 == 16L && !substr(2L)._1.contains("dup"),
      s"non-keeper is cut: ${substr(2L)}")
    // the job wrapper + stats artifact work over the token-grain schema
    val out = java.nio.file.Files.createTempDirectory("graft-substr").toString
    graft.run.PipelineMain.runCurate(spark, docs.count(),
      CurationChain.curateSubstr(docs, "doc_id", "text"), out)
    val stats = spark.read.json(s"$out/stats").collect().head
    assert(stats.getAs[Long]("chunks_removed") == 16L, s"stats: $stats")
    assert(stats.getAs[Long]("n_exported") == 6L)
  }

  test("curateSubstr withinDoc=true stops a keeper shipping its own internal repeats") {
    // r18 verdict residual: a doc that repeats its own boilerplate
    // internally survives stages 1+2 alone (no near-dup, no
    // containment partner) and the cross-doc-only scrub ships the
    // repeat N times in the export. withinDoc=true swaps in the
    // unified occurrence census (q215) and exactly one copy ships.
    val own = (0 until 16).map(i => s"boiler$i")
    val selfRep = (own ++ (0 until 6).map(i => s"mid$i") ++ own).mkString(" ")
    val fillers = (0 until 4).map(k =>
      (10L + k, (0 until 30).map(i => s"fil${k}x$i").mkString(" ")))
    val docs = (Seq((1L, selfRep)) ++ fillers).toDF("doc_id", "text")
    val crossOnly = CurationChain.curateSubstr(docs, "doc_id", "text")
      .select("doc_id", "n_removed").as[(Long, Long)].collect().toMap
    assert(crossOnly(1L) == 0L,
      s"fixture: cross-doc census must ship the internal repeat twice: $crossOnly")
    val unified = CurationChain.curateSubstr(docs, "doc_id", "text",
        withinDoc = true)
      .select("doc_id", "text_scrubbed", "n_removed")
      .as[(Long, String, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(unified.keySet == crossOnly.keySet, "same survivors")
    assert(unified(1L)._2 == 16L &&
      unified(1L)._1 == (own ++ (0 until 6).map(i => s"mid$i")).mkString(" "),
      s"one first-occurrence copy ships: ${unified(1L)}")
    // the stats artifact names its grain (ADVICE r18)
    val stats = CurationChain.stats(docs.count(),
      CurationChain.curateSubstr(docs, "doc_id", "text", withinDoc = true))
      .collect().head
    assert(stats.getAs[String]("grain") == "tokens", s"grain: $stats")
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
