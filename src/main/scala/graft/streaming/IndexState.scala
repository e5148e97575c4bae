package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** At-rest APPEND-ONLY index state for the streaming ingest twins — the
  * shared state layer behind [[StreamPipeline.dedupIndexBatch]],
  * [[StreamPipeline.dhashIndexBatch]] and
  * [[StreamPipeline.splitIndexBatch]] (r16 weak item: those twins
  * re-read the ENTIRE committed index every micro-batch and rebuilt
  * the bloom gate from it, so per-batch cost grew linearly with the
  * landed corpus — O(B²) cumulative). Two mechanisms make the
  * per-batch probe cost FLAT in stream age:
  *
  *  1. GENERATION COMPACTION — the `batch=N` dirs roll up under the
  *     exact [[StreamPipeline.compactRollup]] pointer/tombstone/
  *     straggler protocol (crash-safe at every step, tolerant of a
  *     live writer), with merge = plain UNION: the state is
  *     append-only rows, not an aggregate, so compaction is a rewrite
  *     of N dirs into one. After compaction the read side lists ONE
  *     data dir regardless of stream age, and the unbounded
  *     small-dirs listing problem is gone. [[shouldCompact]] is the
  *     trigger policy: geometric (small dirs together outweigh the
  *     largest — every rewrite at least doubles the compacted mass,
  *     so a row is rewritten O(log batches) times) OR a fan-in cap
  *     (listing + bloom-fold cost per batch stays bounded even under
  *     tiny batches).
  *  2. BLOOM SIDECAR — each batch dir carries `_bloom`, a serialized
  *     filter over THAT batch's new elements, written right after the
  *     parquet commit. The current filter is the driver-side OR-fold
  *     of the committed sidecars (bounded bytes × dir count, dir
  *     count bounded by compaction) — never rebuilt from the full
  *     index. Blooms of equal geometry (numBits, hash count — both
  *     derived from the constant (expectedItems, numBits) the twin
  *     passes every batch) merge losslessly, the same additive-
  *     algebra property the rollup partials rely on. A dir whose
  *     sidecar is missing (crash between the parquet commit and the
  *     sidecar write) HEALS on read: its filter is rebuilt from that
  *     ONE dir's rows — bounded by a single batch — and persisted
  *     back, so the torn window never grows. Decontamination's
  *     fold-once blocklist bloom (`decontaminateStream`) is the same
  *     pattern for static state; this is its incremental form.
  *
  * Elements are 64-bit longs, pre-hashed by the element derivations
  * below so the probe side can compute the IDENTICAL expression
  * against the folded filter ([[org.apache.spark.sql.catalyst
  * .expressions.BloomFilterMightContain]] over a broadcast literal).
  * An empty batch serializes the EMPTY filter at the same geometry so
  * sidecars always merge.
  */
object IndexState {
  private val BloomFile = "_bloom"

  // ---- element derivations (each must match its probe expression) ----

  /** [[StreamPipeline.dedupIndexBatch]] index (`h STRING` content
    * hashes): one element per hash — the probe in
    * [[graft.operators.Dedup.dedupIncremental]] tests
    * xxhash64(content_hash). */
  def dedupElems(idx: DataFrame): DataFrame =
    idx.select(xxhash64(col("h")).as("_e"))

  /** [[StreamPipeline.dhashIndexBatch]] index (`h BIGINT` perceptual
    * hashes): the pigeonhole (chunk index, chunk value) keys of
    * [[graft.operators.Dedup.dedupIncrementalHamming]] — maxHamming+1
    * elements per signature. */
  def dhashElems(maxHamming: Int)(idx: DataFrame): DataFrame = {
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    val cs = (0 until chunks).map { i =>
      shiftrightunsigned(col("h").cast("long"), i * bitsPer)
        .bitwiseAND(lit((1L << bitsPer) - 1))
    }
    idx.select(posexplode(array(cs: _*)))
      .select(xxhash64(col("pos"), col("col")).as("_e"))
  }

  /** [[StreamPipeline.splitIndexBatch]] index (doc_id, side, hs,
    * bands): doc ids salted with -1 (the stickiness probe — band
    * positions are always ≥ 0, so the domains cannot collide) plus
    * every (band position, band hash) key (the candidate probe). */
  def splitElems(idx: DataFrame): DataFrame =
    idx.select(xxhash64(lit(-1), col("doc_id")).as("_e"))
      .unionAll(idx.select(posexplode(col("bands")))
        .select(xxhash64(col("pos"), col("col")).as("_e")))

  /** The probe side of a folded sidecar: true iff `elem` (the same
    * 64-bit expression a derivation above produced) might be in the
    * committed index. */
  def mightContain(bloomBytes: Array[Byte], elem: Column): Column = {
    import org.apache.spark.sql.graft.shim
    shim.column(org.apache.spark.sql.catalyst.expressions
      .BloomFilterMightContain(
        shim.expression(lit(bloomBytes)), shim.expression(elem)))
  }

  // ---- committed-state readers ----

  /** Committed DATA dirs of the live generation (marker-only tombstone
    * dirs left by compaction carry no parquet files and are excluded —
    * the [[StreamPipeline.currentRollup]] discipline). */
  def committedData(spark: SparkSession, stateBase: String): Seq[String] = {
    val gen = StreamPipeline.resolveGen(spark, stateBase)
    val conf = spark.sparkContext.hadoopConfiguration
    IdempotentSink.committedDirs(spark, gen).filter { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(conf).listStatus(p)
        .exists(_.getPath.getName.endsWith(".parquet"))
    }
  }

  /** The committed index as one logical table (empty frame of
    * `ddlIfEmpty` before the first commit). After compaction this is
    * one dir plus the batches since — never the full batch history. */
  def read(spark: SparkSession, stateBase: String, ddlIfEmpty: String): DataFrame = {
    val dirs = committedData(spark, stateBase)
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(ddlIfEmpty))
    else spark.read.parquet(dirs: _*)
  }

  /** The folded filter over every committed batch (None before the
    * first commit). Cost per call: dir-count × bounded bytes on the
    * driver — NOT a scan of the index. Missing sidecars heal here. */
  def currentBloom(spark: SparkSession, stateBase: String,
      elems: DataFrame => DataFrame,
      expectedItems: Long, numBits: Long): Option[Array[Byte]] = {
    val dirs = committedData(spark, stateBase)
    if (dirs.isEmpty) return None
    val conf = spark.sparkContext.hadoopConfiguration
    mergeBlooms(dirs.map { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(conf)
      readBloom(fs, p).getOrElse(healBloom(spark, fs, p, elems, expectedItems, numBits))
    })
  }

  // ---- writers ----

  /** Append one batch of index rows under the live generation:
    * idempotent on the `_SUCCESS` marker (same-batchId replays skip,
    * healing a torn sidecar if the crash hit that window), sidecar
    * written right after the data commit, then the
    * [[StreamPipeline.foldIfSuperseded]] re-resolve so a concurrent
    * compactor can never orphan this batch. */
  def append(df: DataFrame, batchId: Long, stateBase: String,
      elems: DataFrame => DataFrame,
      expectedItems: Long, numBits: Long): Unit = {
    val spark = df.sparkSession
    val gen = StreamPipeline.resolveGen(spark, stateBase)
    val dir = new org.apache.hadoop.fs.Path(s"$gen/batch=$batchId")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
    if (!fs.exists(marker)) {
      // data first (overwrite handles a torn previous attempt; Spark's
      // job commit lands the marker), THEN the sidecar — a crash
      // between the two heals on next read from this one dir's rows.
      df.write.mode("overwrite").parquet(dir.toString)
      healBloom(spark, fs, dir, elems, expectedItems, numBits)
    } else if (readBloom(fs, dir).isEmpty &&
        fs.listStatus(dir).exists(_.getPath.getName.endsWith(".parquet"))) {
      // replay into the sidecar crash window: heal now. A marker-only
      // TOMBSTONE dir (this id was compacted; its elements live in the
      // merged dir's sidecar) has nothing to heal and stays bloom-less.
      healBloom(spark, fs, dir, elems, expectedItems, numBits)
    }
    StreamPipeline.foldIfSuperseded(spark, stateBase, gen, batchId)
  }

  /** Whether the live generation warrants compaction. Geometric
    * trigger: the non-largest dirs together outweigh the largest, so
    * every compaction at least doubles the compacted mass and a row is
    * rewritten O(log batches) times over the stream's life. Fan-in
    * cap: past `maxDirs` committed dirs the per-batch listing +
    * sidecar fold costs dominate, so compact regardless (under
    * pathologically tiny batches this trades some write amplification
    * for the bounded read path — the standard LSM tradeoff; tiered
    * generations would recover O(log) there too and can be layered on
    * this protocol if ever needed). */
  def shouldCompact(spark: SparkSession, stateBase: String,
      maxDirs: Int = 64): Boolean = {
    val dirs = committedData(spark, stateBase)
    if (dirs.size < 2) false
    else if (dirs.size >= maxDirs) true
    else {
      val conf = spark.sparkContext.hadoopConfiguration
      val sizes = dirs.map { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(conf).getContentSummary(p).getLength
      }
      sizes.sum - sizes.max >= sizes.max
    }
  }

  /** Compact the index state: every committed batch dir of the live
    * generation rewrites as ONE union dir (id = highest compacted
    * batch) with ONE merged sidecar in a NEW generation; the other ids
    * tombstone; the numbered pointer swaps; stragglers fold — the
    * [[StreamPipeline.compactRollup]] protocol verbatim (shared
    * skeleton), so the crash/concurrency analysis there applies
    * unchanged. */
  def compact(spark: SparkSession, stateBase: String,
      elems: DataFrame => DataFrame,
      expectedItems: Long, numBits: Long, attempts: Int = 3): Unit =
    StreamPipeline.compactState(spark, stateBase, attempts)(
      dirs => {
        val data = dirs.filter { d =>
          val p = new org.apache.hadoop.fs.Path(d)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
        }
        spark.read.parquet(data: _*)
      })(
      (fs, mergedDir, dirs) => {
        // merged sidecar = OR-fold of the compacted dirs' sidecars
        // (healing any torn one from its own rows — bounded per dir);
        // written after the merged data commit, same heal contract.
        val conf = spark.sparkContext.hadoopConfiguration
        val bs = dirs.filter { d =>
          val p = new org.apache.hadoop.fs.Path(d)
          p.getFileSystem(conf).listStatus(p)
            .exists(_.getPath.getName.endsWith(".parquet"))
        }.map { d =>
          val p = new org.apache.hadoop.fs.Path(d)
          readBloom(fs, p).getOrElse(
            healBloom(spark, fs, p, elems, expectedItems, numBits))
        }
        mergeBlooms(bs).foreach(writeBloom(fs, mergedDir, _))
      })

  // ---- bloom plumbing ----

  /** Aggregate a filter over `elems` (single BIGINT column `_e`) —
    * distributed, one pass, bounded bytes to the driver. An empty
    * frame yields the EMPTY filter at the same geometry (the
    * aggregate's null) so sidecars always merge. */
  def buildBloom(elems: DataFrame, expectedItems: Long, numBits: Long): Array[Byte] = {
    import org.apache.spark.sql.graft.shim
    val bytes = elems.select(shim.column(
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          shim.expression(col("_e")),
          shim.expression(lit(expectedItems)), shim.expression(lit(numBits)))
          .toAggregateExpression()).as("_bf"))
      .head().getAs[Array[Byte]]("_bf")
    if (bytes != null) bytes
    else serialize(org.apache.spark.util.sketch.BloomFilter
      .create(expectedItems, numBits))
  }

  /** OR-fold serialized filters (same geometry by construction —
    * incompatible inputs fail loudly in mergeInPlace, never merge
    * silently wrong). */
  def mergeBlooms(bs: Seq[Array[Byte]]): Option[Array[Byte]] = {
    if (bs.isEmpty) return None
    val f = org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(bs.head))
    bs.tail.foreach { b =>
      f.mergeInPlace(org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(b)))
    }
    Some(serialize(f))
  }

  private def serialize(bf: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Rebuild one dir's sidecar from its own rows (bounded: one batch)
    * and persist it best-effort — the losing writer of a concurrent
    * heal sees the rename fail and keeps its identical bytes. */
  private def healBloom(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, elems: DataFrame => DataFrame,
      expectedItems: Long, numBits: Long): Array[Byte] = {
    val bytes = buildBloom(elems(spark.read.parquet(dir.toString)),
      expectedItems, numBits)
    writeBloom(fs, dir, bytes)
    bytes
  }

  private def writeBloom(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, bytes: Array[Byte]): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(dir, BloomFile + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    // atomic publish; a false rename means a concurrent healer already
    // published identical bytes — drop the tmp and keep theirs
    if (!fs.rename(tmp, new org.apache.hadoop.fs.Path(dir, BloomFile)))
      fs.delete(tmp, false)
  }

  private def readBloom(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Option[Array[Byte]] = {
    val p = new org.apache.hadoop.fs.Path(dir, BloomFile)
    if (!fs.exists(p)) None
    else {
      val len = fs.getFileStatus(p).getLen.toInt
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](len)
        in.readFully(0, buf)
        Some(buf)
      } finally in.close()
    }
  }
}
