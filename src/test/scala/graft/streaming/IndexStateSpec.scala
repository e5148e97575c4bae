package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The at-rest index state layer (r16 weak item): bloom sidecars fold
  * to the same filter the per-batch aggregate would build, missing
  * sidecars heal from their own dir, generation compaction preserves
  * the state and the replay-skip contract, and the streaming twins'
  * outputs are invariant under any compaction schedule. */
class IndexStateSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-ixs-$tag").toString

  test("bloom sidecars: aggregate bytes, sketch-merge fold, probe; empty geometry merges") {
    val a = IndexState.buildBloom(
      (1L to 100L).toDF("_e"), 1000L, 1L << 16)
    val b = IndexState.buildBloom(
      (200L to 300L).toDF("_e"), 1000L, 1L << 16)
    val empty = IndexState.buildBloom(
      spark.emptyDataset[Long].toDF("_e"), 1000L, 1L << 16)
    val folded = IndexState.mergeBlooms(Seq(a, empty, b)).get
    val probed = (1L to 400L).toDF("v")
      .select(col("v"), IndexState.mightContain(folded, col("v")).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // no false negatives, ever
    assert(((1L to 100L) ++ (200L to 300L)).forall(probed(_)),
      "every inserted element must probe positive after the fold")
    // the gap is mostly negative (fpp is tiny at this geometry)
    val fp = (101L to 199L).count(probed(_))
    assert(fp < 10, s"false-positive flood in the gap: $fp of 99")
  }

  test("dedup index: compaction preserves state, replay-skip, and the cross-batch drop") {
    val out = tmp("cmp-out") + "/out"
    val idx = tmp("cmp-idx") + "/index"
    def batchOf(rows: (Long, String)*) = rows.toDF("doc_id", "text")
    // maxIndexDirs = 2: compact after (nearly) every batch — the most
    // hostile schedule for the replay/identity contract
    StreamPipeline.dedupIndexBatch(
      batchOf((1L, "alpha body"), (2L, "beta body")), 0L, "doc_id", "text",
      out, idx, maxIndexDirs = 2)
    StreamPipeline.dedupIndexBatch(
      batchOf((3L, "gamma body"), (4L, "alpha body")), 1L, "doc_id", "text",
      out, idx, maxIndexDirs = 2)
    StreamPipeline.dedupIndexBatch(
      batchOf((5L, "delta body")), 2L, "doc_id", "text",
      out, idx, maxIndexDirs = 2)
    def survivors() = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(survivors() == Set(1L, 2L, 3L, 5L), s"got ${survivors()}")
    // state compacted: the live generation lists ONE data dir
    assert(IndexState.committedData(spark, idx).size == 1,
      s"expected one compacted dir: ${IndexState.committedData(spark, idx)}")
    assert(IndexState.read(spark, idx, "h STRING").distinct().count() == 4)
    // replay of a pre-compaction batch id skips on the tombstone marker
    StreamPipeline.dedupIndexBatch(
      batchOf((3L, "gamma body"), (4L, "alpha body")), 1L, "doc_id", "text",
      out, idx, maxIndexDirs = 2)
    assert(survivors() == Set(1L, 2L, 3L, 5L), "replay must not change survivors")
    assert(IndexState.read(spark, idx, "h STRING").distinct().count() == 4)
    // a duplicate of batch-0 content still drops through the compacted
    // index (the sidecar fold + anti-join see the merged state)
    StreamPipeline.dedupIndexBatch(
      batchOf((6L, "ALPHA body"), (7L, "epsilon body")), 3L, "doc_id", "text",
      out, idx, maxIndexDirs = 2)
    assert(survivors() == Set(1L, 2L, 3L, 5L, 7L), s"got ${survivors()}")
  }

  test("a missing sidecar heals from its own dir; the gate still drops cross-batch dups") {
    val out = tmp("heal-out") + "/out"
    val idx = tmp("heal-idx") + "/index"
    def batchOf(rows: (Long, String)*) = rows.toDF("doc_id", "text")
    StreamPipeline.dedupIndexBatch(
      batchOf((1L, "alpha body")), 0L, "doc_id", "text", out, idx,
      maxIndexDirs = Int.MaxValue)
    // crash window: the data committed but the sidecar write was lost
    val bloomFile = new java.io.File(s"$idx/batch=0/_bloom")
    assert(bloomFile.exists(), "fixture expects a sidecar to delete")
    assert(bloomFile.delete())
    // next batch heals it on read and the duplicate still drops
    StreamPipeline.dedupIndexBatch(
      batchOf((2L, "alpha body"), (3L, "beta body")), 1L, "doc_id", "text",
      out, idx, maxIndexDirs = Int.MaxValue)
    assert(bloomFile.exists(), "sidecar must be healed in place")
    val survivors = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 3L), s"got $survivors")
  }

  test("shouldCompact: geometric trigger and fan-in cap") {
    val base = tmp("pol") + "/state"
    val elems = (idx: org.apache.spark.sql.DataFrame) =>
      idx.select(xxhash64(col("h").cast("string")).as("_e"))
    assert(!IndexState.shouldCompact(spark, base), "empty state never compacts")
    IndexState.append((1L to 100L).toDF("h"), 0L, base, elems, 1000L, 1L << 16)
    assert(!IndexState.shouldCompact(spark, base), "one dir never compacts")
    IndexState.append((101L to 200L).toDF("h"), 1L, base, elems, 1000L, 1L << 16)
    // two similar-sized dirs: the small mass matches the largest
    assert(IndexState.shouldCompact(spark, base), "equal dirs must compact")
    IndexState.compact(spark, base, elems, 1000L, 1L << 16)
    assert(!IndexState.shouldCompact(spark, base), "freshly compacted")
    assert(IndexState.read(spark, base, "h BIGINT").distinct().count() == 200,
      "compaction must preserve every row")
    // a tiny tail after a big compacted dir: geometric trigger holds off
    IndexState.append(Seq(201L).toDF("h"), 2L, base, elems, 1000L, 1L << 16)
    assert(!IndexState.shouldCompact(spark, base),
      "a tiny dir after a big one must NOT trigger (write amplification)")
    // ... but the fan-in cap fires regardless of sizes
    assert(IndexState.shouldCompact(spark, base, maxDirs = 2))
  }

  test("compaction writes a range manifest, not tombstone dirs: generation stays flat") {
    val out = tmp("man-out") + "/out"
    val idx = tmp("man-idx") + "/index"
    def batchOf(rows: (Long, String)*) = rows.toDF("doc_id", "text")
    // many batches under the most hostile schedule (compact ~every
    // batch): with per-id tombstones the generation accumulated one
    // marker dir per batch EVER (re-tombstoned each rollover — the
    // ADVICE r17 O(stream age) metadata walk); with the manifest the
    // generation holds only real data dirs, forever
    (0 until 8).foreach { b =>
      StreamPipeline.dedupIndexBatch(
        batchOf((b * 10L, s"body number $b")), b.toLong, "doc_id", "text",
        out, idx, maxIndexDirs = 2)
    }
    val gen = StreamPipeline.resolveGen(spark, idx)
    val dirs = new java.io.File(gen).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(dirs.length <= 2,
      s"generation must hold only live data dirs, got ${dirs.map(_.getName).toSeq}")
    assert(dirs.forall(d => d.listFiles().exists(_.getName.endsWith(".parquet"))),
      "no marker-only dirs may remain in the generation")
    val fs = new org.apache.hadoop.fs.Path(gen)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // contiguous ids coalesce to ONE range no matter how many rollovers
    val ranges = IdempotentSink.compactedRanges(fs,
      new org.apache.hadoop.fs.Path(gen))
    assert(ranges.size == 1 && ranges.head._1 == 0L,
      s"contiguous history must stay one range, got $ranges")
    // replay of an ancient compacted id skips via the manifest
    val pre = spark.read.parquet(out).count()
    val preIdx = IndexState.read(spark, idx, "h STRING").count()
    StreamPipeline.dedupIndexBatch(
      batchOf((0L, "body number 0")), 0L, "doc_id", "text", out, idx,
      maxIndexDirs = 2)
    assert(spark.read.parquet(out).count() == pre, "replay must skip output")
    assert(IndexState.read(spark, idx, "h STRING").count() == preIdx,
      "replay must not re-append index rows")
  }

  test("merged-dir sidecar loss after the pointer swap heals from the merged rows") {
    val out = tmp("mheal-out") + "/out"
    val idx = tmp("mheal-idx") + "/index"
    def batchOf(rows: (Long, String)*) = rows.toDF("doc_id", "text")
    StreamPipeline.dedupIndexBatch(
      batchOf((1L, "alpha body")), 0L, "doc_id", "text", out, idx, maxIndexDirs = 2)
    StreamPipeline.dedupIndexBatch(
      batchOf((2L, "beta body")), 1L, "doc_id", "text", out, idx, maxIndexDirs = 2)
    // the state is compacted to one merged dir; lose ITS sidecar (the
    // one heal NOT single-batch bounded — cost = the compacted corpus,
    // once; reachable via object-store corruption or manual deletion)
    assert(IndexState.committedData(spark, idx).size == 1,
      "fixture expects a compacted state")
    val gen = StreamPipeline.resolveGen(spark, idx)
    val dataDirs = new java.io.File(gen).listFiles().filter(d =>
      d.isDirectory && d.getName.startsWith("batch=") &&
        d.listFiles().exists(_.getName.endsWith(".parquet")))
    assert(dataDirs.length == 1, s"got ${dataDirs.map(_.getName).toSeq}")
    val f = new java.io.File(dataDirs.head, "_bloom")
    assert(f.exists(), s"fixture expects a merged sidecar at $f")
    assert(f.delete())
    // the next batch's fold heals it from the merged dir's own rows and
    // the gate still drops duplicates of BOTH compacted batches
    StreamPipeline.dedupIndexBatch(
      batchOf((3L, "alpha body"), (4L, "beta body"), (5L, "gamma body")),
      2L, "doc_id", "text", out, idx, maxIndexDirs = Int.MaxValue)
    assert(f.exists(), "merged sidecar must be healed in place")
    val survivors = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 2L, 5L), s"got $survivors")
  }

  test("a corrupt sidecar is quarantined and healed, not a permanent wedge") {
    val out = tmp("cor-out") + "/out"
    val idx = tmp("cor-idx") + "/index"
    def batchOf(rows: (Long, String)*) = rows.toDF("doc_id", "text")
    StreamPipeline.dedupIndexBatch(
      batchOf((1L, "alpha body")), 0L, "doc_id", "text", out, idx,
      maxIndexDirs = Int.MaxValue)
    // torn write: garbage bytes where the serialized filter belongs —
    // pre-fix, BloomFilter.readFrom threw on EVERY subsequent batch
    val bloomFile = new java.io.File(s"$idx/batch=0/_bloom")
    assert(bloomFile.exists())
    java.nio.file.Files.write(bloomFile.toPath,
      Array[Byte](1, 2, 3, 4, 5, 6, 7))
    StreamPipeline.dedupIndexBatch(
      batchOf((2L, "alpha body"), (3L, "beta body")), 1L, "doc_id", "text",
      out, idx, maxIndexDirs = Int.MaxValue)
    val survivors = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 3L), s"got $survivors")
    // healed: the sidecar parses again
    assert(IndexState.saturation(
      java.nio.file.Files.readAllBytes(bloomFile.toPath)) >= 0.0)
  }

  test("geometry re-size mid-stream: incompatible sidecars migrate on the next fold") {
    val base = tmp("geo") + "/state"
    val elems = (idx: org.apache.spark.sql.DataFrame) =>
      idx.select(xxhash64(col("h").cast("string")).as("_e"))
    IndexState.append((1L to 50L).toDF("h"), 0L, base, elems, 1000L, 1L << 16)
    IndexState.append((51L to 100L).toDF("h"), 1L, base, elems, 1000L, 1L << 16)
    // the caller re-sizes after a saturation warning; at-rest sidecars
    // still carry the old geometry. Force the mixed-geometry state a
    // live stream would hit: one dir already healed at the NEW geometry
    assert(new java.io.File(s"$base/batch=0/_bloom").delete())
    val folded = IndexState.currentBloom(spark, base, elems, 4000L, 1L << 18)
    assert(folded.isDefined, "migration must produce a folded filter, not throw")
    val probed = (1L to 100L).toDF("v")
      .select(IndexState.mightContain(folded.get, xxhash64(col("v").cast("string"))).as("hit"))
      .collect().forall(_.getBoolean(0))
    assert(probed, "no false negatives across the migrated fold")
  }

  test("split twin: outputs invariant under a hostile compaction schedule; poisoning survives") {
    import graft.functions.{TextFunctions => T}
    def toks = (0 until 40).map(i => s"ixw$i")
    val z = toks.mkString(" ")
    val a = toks.updated(5, "ixa5").mkString(" ")
    val b = toks.updated(30, "ixb30").mkString(" ")
    def run(maxDirs: Int): (Map[Long, String], Long) = {
      val out = tmp(s"spl-$maxDirs") + "/out"
      val idx = tmp(s"spli-$maxDirs") + "/index"
      val planted = Seq((100L, a, "train"), (200L, b, "test"))
        .toDF("doc_id", "text", "side")
        .select(col("doc_id"), col("side"),
          T.shingleHashes(col("text"), 3).as("hs"))
        .withColumn("bands", T.bandHashes(T.minhashSignature(col("hs"), 32), 32, 8))
        .select("doc_id", "side", "hs", "bands")
      IdempotentSink.writeBatch(idx)(planted, 0L)
      StreamPipeline.splitIndexBatch(
        Seq((300L, z)).toDF("doc_id", "text"), 1L, "doc_id", "text", out, idx,
        maxIndexDirs = maxDirs)
      StreamPipeline.splitIndexBatch(
        Seq((400L, toks.updated(1, "ixy1").mkString(" ")),
            (500L, (0 until 40).map(i => s"fresh$i").mkString(" ")))
          .toDF("doc_id", "text"), 2L, "doc_id", "text", out, idx,
        maxIndexDirs = maxDirs)
      val got = spark.read.parquet(out).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("side")).toMap
      (got, IndexState.read(spark, idx,
        "doc_id BIGINT, side STRING, hs ARRAY<BIGINT>, bands ARRAY<BIGINT>")
        .select("doc_id").distinct().count())
    }
    val (eager, nEager) = run(maxDirs = 2)       // compact after every batch
    val (lazyRun, nLazy) = run(maxDirs = 10000)  // geometric schedule only
    assert(eager == lazyRun,
      s"assignments must not depend on the compaction schedule: $eager vs $lazyRun")
    assert(eager(300L) == "quarantined" && eager(400L) == "quarantined",
      s"bridge + poisoned successor: $eager")
    assert(Set("train", "test").contains(eager(500L)), s"fresh doc: $eager")
    assert(nEager == 5 && nLazy == 5, s"index rows: $nEager/$nLazy")
  }

  test("postings sidecar: compaction writes it bucket-partitioned; pruned probes are sound") {
    import graft.functions.{TextFunctions => T}
    val idx = tmp("post") + "/index"
    def docsOf(ids: Range) = ids.map { i =>
      (i.toLong, (0 until 40).map(j => s"p${i}w$j").mkString(" "), "train")
    }.toDF("doc_id", "text", "side")
      .select(col("doc_id"), col("side"),
        T.shingleHashes(col("text"), 3).as("hs"))
      .withColumn("bands", T.bandHashes(T.minhashSignature(col("hs"), 32), 32, 8))
      .select("doc_id", "side", "hs", "bands")
    IndexState.append(docsOf(0 until 30), 0L, idx,
      IndexState.splitElems, 1000L, 1L << 16)
    IndexState.append(docsOf(30 until 60), 1L, idx,
      IndexState.splitElems, 1000L, 1L << 16)
    IndexState.compact(spark, idx, IndexState.splitElems, 1000L, 1L << 16,
      shape = (df, bytes) => df
        .repartitionByRange(IndexState.sizedFileCount(bytes), col("doc_id"))
        .sortWithinPartitions(col("doc_id")),
      extraMergedWrite = (s, dir) => IndexState.writePostings(s, dir))
    val dataDirs = IndexState.committedData(spark, idx)
    assert(dataDirs.size == 1, s"expected one merged dir: $dataDirs")
    val postDir = new java.io.File(
      new java.net.URI(dataDirs.head).getPath, "_postings")
    assert(postDir.isDirectory &&
      postDir.listFiles().exists(_.getName.startsWith("bucket=")),
      s"merged dir must carry a bucket-partitioned _postings sidecar: $postDir")
    // full bucket list == the direct explode of the docs, row for row
    val docs = IndexState.read(spark, idx,
      "doc_id BIGINT, side STRING, hs ARRAY<BIGINT>, bands ARRAY<BIGINT>")
    val direct = IndexState.postingsOf(docs)
      .select("b", "k", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val all = IndexState.prunedPostings(spark, idx,
        0 until IndexState.PostingsBuckets)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(all == direct, s"full probe must equal the explode: ${all.size} vs ${direct.size}")
    // pruning soundness: a subset probe returns EVERY row of the keys
    // that hash into the requested buckets, and nothing else
    val subset = Seq(0, 1, 2, 3)
    val pruned = IndexState.prunedPostings(spark, idx, subset)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val bucketOf = IndexState.postingsOf(docs)
      .select(col("b"), col("k"), col("doc_id"), col("bucket"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)) -> r.getInt(3)).toMap
    val want = direct.filter(t => subset.contains(bucketOf(t)))
    assert(pruned == want,
      s"bucket-pruned probe must be exact: got ${pruned.size}, want ${want.size}")
    assert(pruned.size < direct.size,
      "fixture must actually prune (subset buckets hold a strict subset)")
  }

  test("a merged dir WITHOUT _postings (pre-r19 layout) degrades to the inline explode") {
    import graft.functions.{TextFunctions => T}
    def toks = (0 until 40).map(i => s"lgw$i")
    val out = tmp("leg-out") + "/out"
    val idx = tmp("leg-idx") + "/index"
    val planted = Seq((100L, toks.updated(5, "lga5").mkString(" "), "train"))
      .toDF("doc_id", "text", "side")
      .select(col("doc_id"), col("side"),
        T.shingleHashes(col("text"), 3).as("hs"))
      .withColumn("bands", T.bandHashes(T.minhashSignature(col("hs"), 32), 32, 8))
      .select("doc_id", "side", "hs", "bands")
    IdempotentSink.writeBatch(idx)(planted, 0L)
    // batch 1 compacts (maxDirs=2) → merged dir gains _postings; delete
    // it to simulate the pre-r19 merged layout
    StreamPipeline.splitIndexBatch(
      Seq((200L, (0 until 40).map(i => s"x$i").mkString(" ")))
        .toDF("doc_id", "text"), 1L, "doc_id", "text", out, idx,
      maxIndexDirs = 2)
    val dataDirs = IndexState.committedData(spark, idx)
    assert(dataDirs.size == 1)
    val postDir = new java.io.File(
      new java.net.URI(dataDirs.head).getPath, "_postings")
    assert(postDir.isDirectory, "fixture expects the sidecar to delete")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(postDir)
    // a near-dup of the planted doc must still adopt its side — the
    // probe explodes the sidecar-less merged dir inline
    StreamPipeline.splitIndexBatch(
      Seq((300L, toks.updated(1, "lgy1").mkString(" ")))
        .toDF("doc_id", "text"), 2L, "doc_id", "text", out, idx,
      maxIndexDirs = 10000)
    val got = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("side")).toMap
    assert(got(300L) == "train", s"legacy merged dir must still match: $got")
  }

  test("compacted-id manifest: v1 sentinel detects truncation; legacy header-less accepted") {
    val dir = new org.apache.hadoop.fs.Path(tmp("man") + "/gen")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    IdempotentSink.writeCompactedRanges(fs, dir, Seq((0L, 5L), (9L, 12L)))
    assert(IdempotentSink.compactedRanges(fs, dir) == Seq((0L, 5L), (9L, 12L)))
    val manifest = new java.io.File(new java.net.URI(
      new org.apache.hadoop.fs.Path(dir, "_COMPACTED").toString).getPath)
    val lines = new String(
      java.nio.file.Files.readAllBytes(manifest.toPath), "UTF-8").split("\n")
    assert(lines.head.startsWith("v1 "), s"header: ${lines.head}")
    // the local fs keeps its own .crc sidecar; drop it so the test
    // exercises THE MANIFEST's sentinel, not hadoop's checksum layer
    // (object stores have no such layer — the sentinel is the defense)
    def rewrite(text: String): Unit = {
      java.nio.file.Files.write(manifest.toPath, text.getBytes("UTF-8"))
      new java.io.File(manifest.getParentFile, "._COMPACTED.crc").delete()
    }
    // truncation that stays PARSEABLE (the ADVICE r18 threat: the lost
    // tail silently un-covers ids) — must fail stop, not skip
    rewrite(lines.head + "\n" + lines(1))
    val e = intercept[IllegalStateException] {
      IdempotentSink.compactedRanges(fs, dir)
    }
    assert(e.getMessage.contains("integrity"), e.getMessage)
    // a pre-r19 header-less manifest still reads (accepted with a WARN)
    rewrite("0-5\n9-12")
    assert(IdempotentSink.compactedRanges(fs, dir) == Seq((0L, 5L), (9L, 12L)))
  }
}
