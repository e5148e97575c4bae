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
  *     exact [[StreamPipeline.compactRollup]] pointer/manifest/
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

  /** Committed DATA dirs of the live generation. Compacted-away ids
    * have no dirs at all (they live in the generation's `_COMPACTED`
    * range manifest), so this walk is bounded by the compaction fan-in
    * cap forever; the parquet-presence filter stays as a defensive
    * guard against marker-only dirs (the pre-manifest layout). */
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
    * driver — NOT a scan of the index. Missing sidecars heal here.
    *
    * SATURATION is checked on every fold (ADVICE r17): a filter sized
    * for `expectedItems` silently degrades once the landed element
    * count outgrows it — false-positive rate climbs toward 1, the
    * zero-positive fast paths stop firing, and per-batch cost reverts
    * to full index-scan joins with no correctness signal (FPs fall
    * back to exact joins). When the folded filter's expected FP rate
    * exceeds [[SaturationWarnFpp]] a WARN names the state dir and the
    * fix (re-size via the twin's expectedItems/numBits parameters),
    * so the degradation is visible instead of silent. */
  def currentBloom(spark: SparkSession, stateBase: String,
      elems: DataFrame => DataFrame,
      expectedItems: Long, numBits: Long): Option[Array[Byte]] = {
    val dirs = committedData(spark, stateBase)
    if (dirs.isEmpty) return None
    val conf = spark.sparkContext.hadoopConfiguration
    def sidecars(): Seq[Array[Byte]] = dirs.map { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(conf)
      readBloom(fs, p).getOrElse(healBloom(spark, fs, p, elems, expectedItems, numBits))
    }
    val merged =
      try mergeBlooms(sidecars())
      catch {
        case _: org.apache.spark.util.sketch.IncompatibleMergeException =>
          // geometry migration: the caller re-sized expectedItems /
          // numBits (the saturation fix) and at-rest sidecars still
          // carry the old geometry — rebuild EVERY dir's sidecar at
          // the passed geometry (bounded per dir, one-off) and re-fold
          dirs.foreach { d =>
            val p = new org.apache.hadoop.fs.Path(d)
            val fs = p.getFileSystem(conf)
            fs.delete(new org.apache.hadoop.fs.Path(p, BloomFile), false)
            healBloom(spark, fs, p, elems, expectedItems, numBits)
          }
          mergeBlooms(sidecars())
      }
    merged.foreach { bytes =>
      val fpp = saturation(bytes)
      if (fpp > SaturationWarnFpp)
        log.warn(f"index-state bloom for $stateBase is saturating: expected " +
          f"FP rate $fpp%.3f > $SaturationWarnFpp%.2f — the zero-positive " +
          "fast path will stop firing; re-size the filter via the stream " +
          "twin's expectedItems/numBits parameters (next compaction " +
          "rebuilds sidecars at the new geometry)")
    }
    merged
  }

  /** Expected false-positive rate of a serialized filter given what has
    * been inserted — the saturation metric [[currentBloom]] warns on,
    * public so jobs can export it. */
  def saturation(bloomBytes: Array[Byte]): Double =
    org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(bloomBytes)).expectedFpp()

  /** Folded-filter expected-FP threshold above which [[currentBloom]]
    * logs the saturation warning. */
  val SaturationWarnFpp = 0.10

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

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
    // a replayed COMPACTED batch has no dir of its own — its rows live
    // in the merged dir and its elements in the merged sidecar; the
    // generation's range manifest is the skip signal
    if (IdempotentSink.isCompacted(fs,
        new org.apache.hadoop.fs.Path(gen), batchId)) {
      StreamPipeline.foldIfSuperseded(spark, stateBase, gen, batchId)
      return
    }
    val marker = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
    if (!fs.exists(marker)) {
      // data first (overwrite handles a torn previous attempt; Spark's
      // job commit lands the marker), THEN the sidecar — a crash
      // between the two heals on next read from this one dir's rows.
      df.write.mode("overwrite").parquet(dir.toString)
      healBloom(spark, fs, dir, elems, expectedItems, numBits)
    } else if (readBloom(fs, dir).isEmpty &&
        fs.listStatus(dir).exists(_.getPath.getName.endsWith(".parquet"))) {
      // replay into the sidecar crash window (or a corrupt sidecar
      // readBloom just quarantined): heal now from this dir's rows.
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
    * batch) with ONE merged sidecar in a NEW generation; the folded
    * ids land in the generation's range manifest; the numbered pointer
    * swaps; stragglers fold — the [[StreamPipeline.compactRollup]]
    * protocol verbatim (shared skeleton), so the crash/concurrency
    * analysis there applies unchanged.
    *
    * The merged sidecar is REBUILT from the merged dir's own rows at
    * the passed geometry, not OR-folded from the old sidecars: the
    * data is already being read for the rewrite (the extra aggregate
    * rides the same scan cost class), and a caller that re-sized
    * expectedItems/numBits after a saturation warning gets the new
    * geometry applied here — compaction is the migration point.
    *
    * Heal-cost note (the one heal NOT single-batch bounded): a crash
    * in the window between the merged dir's data commit and its
    * sidecar write leaves a pointer-less half-built generation —
    * invisible, retried from scratch — but if the merged sidecar is
    * ever lost AFTER the pointer swap (manual deletion, object-store
    * corruption), the next reader rebuilds it from the merged dir's
    * rows: bounded by the COMPACTED corpus, i.e. one compaction's own
    * read cost, once — not per batch (IndexStateSpec pins the heal). */
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
      (fs, mergedDir, _) =>
        writeBloom(fs, mergedDir, buildBloom(
          elems(spark.read.parquet(mergedDir.toString)),
          expectedItems, numBits)))

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
    // tmp name unique PER WRITER: concurrent healers sharing one tmp
    // path could rename each other's in-flight file and publish a torn
    // sidecar (ADVICE r17) — with unique names each rename publishes
    // only its own fully-written bytes
    val tmp = new org.apache.hadoop.fs.Path(dir,
      BloomFile + ".tmp-" + java.util.UUID.randomUUID().toString)
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    // atomic publish; a false rename means a concurrent healer already
    // published identical bytes — drop the tmp and keep theirs
    if (!fs.rename(tmp, new org.apache.hadoop.fs.Path(dir, BloomFile)))
      fs.delete(tmp, false)
  }

  /** Read a dir's sidecar, VALIDATING the bytes deserialize into a
    * filter — a corrupt/truncated `_bloom` (torn rename on an
    * object store, partial write) is quarantined (deleted) and treated
    * as missing, so the caller's heal path rebuilds it from the dir's
    * own rows instead of every subsequent batch throwing on the same
    * poisoned file (ADVICE r17). */
  private def readBloom(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Option[Array[Byte]] = {
    val p = new org.apache.hadoop.fs.Path(dir, BloomFile)
    if (!fs.exists(p)) None
    else
      try {
        // both the raw read (checksum mismatch on a torn local file)
        // and the deserialization can surface the corruption — either
        // way the sidecar is quarantined, never a permanent wedge
        val len = fs.getFileStatus(p).getLen.toInt
        val in = fs.open(p)
        val buf =
          try {
            val b = new Array[Byte](len)
            in.readFully(0, b)
            b
          } finally in.close()
        org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(buf))
        Some(buf)
      } catch {
        case scala.util.control.NonFatal(_) =>
          fs.delete(p, false)
          None
      }
  }
}
