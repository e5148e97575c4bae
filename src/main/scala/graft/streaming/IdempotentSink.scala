package graft.streaming

import org.apache.spark.sql.DataFrame

/** Exactly-once `foreachBatch` writer: each micro-batch lands in its own
  * `batch=<id>` directory, and a re-delivered batch (replay after
  * checkpoint recovery — foreachBatch is at-least-once by contract) is
  * skipped when its `_SUCCESS` marker already exists. This is the
  * transactional-sink discipline the reference's Delta `toTable` append
  * gets from Delta's log, rebuilt on plain parquet for the no-Delta-jars
  * environment: idempotence comes from the (batchId → directory)
  * mapping plus the atomic-enough commit marker, not from the format.
  *
  * Readers consume `spark.read.parquet(outBase)` — `batch` becomes a
  * discovered partition column (drop it, or keep it as lineage). */
object IdempotentSink {

  private val ManifestFile = "_COMPACTED"

  def writeBatch(outBase: String)(df: DataFrame, batchId: Long): Unit = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(s"$outBase/batch=$batchId")
    val fs = dir.getFileSystem(conf)
    // a batch compaction already folded has no dir of its own — its
    // rows live in the merged dir and its id in the generation's
    // manifest; re-writing it would double-count on the next merge
    if (isCompacted(fs, new org.apache.hadoop.fs.Path(outBase), batchId))
      return
    val marker = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
    if (!fs.exists(marker)) {
      // overwrite handles a torn previous attempt (dir without marker)
      df.write.mode("overwrite").parquet(dir.toString)
    }
  }

  // ---- compacted-id manifest ----
  //
  // Replay suppression for batches a compaction folded away used to be
  // one marker-only TOMBSTONE dir per compacted id — and because each
  // compaction re-tombstoned every id the OLD generation listed
  // (including its own tombstones), the dir count grew with total
  // batches EVER, so the per-batch listStatus/exists walk over the
  // generation was O(stream age) forever even after data compaction
  // (ADVICE r17). The manifest replaces the dirs: ONE `_COMPACTED`
  // file per generation holding the folded ids as sorted coalesced
  // ranges ("lo-hi" lines). foreachBatch ids are contiguous, so the
  // file is a single line for the stream's whole life, and every
  // skip/fold check is one bounded file read instead of a dir walk.

  /** Whether `batchId` was folded into this generation's merged dir by
    * a compaction (its replay must skip; a fold of it must no-op). */
  def isCompacted(fs: org.apache.hadoop.fs.FileSystem,
      genDir: org.apache.hadoop.fs.Path, batchId: Long): Boolean =
    compactedRanges(fs, genDir).exists { case (lo, hi) =>
      batchId >= lo && batchId <= hi
    }

  /** The generation's compacted-id ranges (empty when no compaction
    * has folded into it).
    *
    * INTEGRITY (ADVICE r18): the manifest cannot be rebuilt from data —
    * a truncated-but-parseable file silently un-covers compacted ids
    * and a replay then double-writes rows that already live in the
    * merged dir. v1 manifests therefore lead with a header line
    * `v1 <rangeCount> <crc32-hex of the body>`; any count or checksum
    * mismatch (and any malformed body line) FAILS STOP — corruption is
    * loud, never a silent un-cover. A header-less file is the pre-r19
    * layout, accepted with a WARN (it predates the sentinel, so
    * truncation of it is undetectable by construction; the next
    * compaction rewrites it as v1). */
  def compactedRanges(fs: org.apache.hadoop.fs.FileSystem,
      genDir: org.apache.hadoop.fs.Path): Seq[(Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(genDir, ManifestFile)
    if (!fs.exists(p)) return Nil
    val in = fs.open(p)
    val text =
      try {
        val len = fs.getFileStatus(p).getLen.toInt
        val buf = new Array[Byte](len)
        in.readFully(0, buf)
        new String(buf, "UTF-8")
      } finally in.close()
    val lines = text.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    val body = lines.headOption match {
      case Some(h) if h.startsWith("v1 ") =>
        val rest = lines.tail
        h.split(" ") match {
          case Array(_, count, crcHex) =>
            // a non-numeric count field is the same corruption class as
            // a count/crc mismatch — raise the designed diagnostic, not
            // a raw NumberFormatException that skips the crc check
            // entirely (ADVICE r19)
            val n = try count.toInt catch {
              case _: NumberFormatException =>
                throw new IllegalStateException(
                  s"malformed compacted-id manifest header '$h' in $p — " +
                    "non-numeric range count; the file is corrupt/" +
                    "truncated and skipping it would silently un-cover " +
                    "compacted batch ids. Restore the manifest from a " +
                    "backup of the generation dir.")
            }
            if (rest.size != n || crc32Hex(rest) != crcHex)
              throw new IllegalStateException(
                s"compacted-id manifest $p fails its integrity sentinel " +
                  s"(header '$h', body lines ${rest.size}, crc " +
                  s"${crc32Hex(rest)}) — the file is corrupt/truncated; " +
                  "skipping it would silently un-cover compacted batch " +
                  "ids and double-count their rows on replay. Restore " +
                  "the manifest from a backup of the generation dir.")
          case _ => throw new IllegalStateException(
            s"malformed compacted-id manifest header '$h' in $p")
        }
        rest
      case Some(_) =>
        log.warn(s"compacted-id manifest $p has no v1 integrity header " +
          "(pre-r19 layout) — truncation of it is undetectable; the next " +
          "compaction rewrites it with a sentinel")
        lines
      case None => Nil
    }
    body.map { line =>
      try line.split("-") match {
        case Array(lo, hi) => (lo.toLong, hi.toLong)
        case Array(lo)     => (lo.toLong, lo.toLong)
        case _ => throw new IllegalStateException(
          s"malformed compacted-id manifest line '$line' in $p")
      } catch {
        case _: NumberFormatException => throw new IllegalStateException(
          s"malformed compacted-id manifest line '$line' in $p")
      }
    }
  }

  private def crc32Hex(bodyLines: Seq[String]): String = {
    val crc = new java.util.zip.CRC32()
    crc.update(bodyLines.mkString("\n").getBytes("UTF-8"))
    java.lang.Long.toHexString(crc.getValue)
  }

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Publish the generation's manifest (tmp-write + atomic rename; the
    * tmp name is unique per writer so concurrent attempts never rename
    * each other's half-written file). Written BEFORE the generation's
    * pointer swap, so a crash leaves a dead half-built generation and
    * the old state intact — the compactState crash contract. */
  def writeCompactedRanges(fs: org.apache.hadoop.fs.FileSystem,
      genDir: org.apache.hadoop.fs.Path, ranges: Seq[(Long, Long)]): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(genDir,
      ManifestFile + ".tmp-" + java.util.UUID.randomUUID().toString)
    val body = ranges.map { case (lo, hi) => s"$lo-$hi" }
    val out = fs.create(tmp, true)
    try out.write(
      (s"v1 ${body.size} ${crc32Hex(body)}" +: body).mkString("\n")
        .getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, new org.apache.hadoop.fs.Path(genDir, ManifestFile)))
      fs.delete(tmp, false)
  }

  /** Sorted, overlap/adjacency-coalesced ranges over `ranges ∪ ids` —
    * contiguous foreachBatch ids collapse to one range. */
  def coalesceRanges(ranges: Seq[(Long, Long)], ids: Seq[Long]): Seq[(Long, Long)] =
    (ranges ++ ids.map(i => (i, i))).sorted
      .foldLeft(List.empty[(Long, Long)]) {
        case ((lo, hi) :: rest, (l, h)) if l <= hi + 1 =>
          (lo, math.max(hi, h)) :: rest
        case (acc, r) => r :: acc
      }.reverse

  /** The COMMITTED batch directories under `base`: only those whose
    * `_SUCCESS` marker exists. This is the read-side half of the sink's
    * contract — a crash mid-write leaves a `batch=N` dir with data files
    * but no marker, and any consumer that globs the whole base
    * (`spark.read.parquet(base)`) silently treats that torn state as
    * committed. State readers (the streaming dedup index, downstream
    * jobs) must read exactly this list. */
  def committedDirs(spark: org.apache.spark.sql.SparkSession, base: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .filter(s => fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.toString)
      .sorted
  }

  /** Attach to a stream: `.writeStream.foreachBatch(IdempotentSink.writeBatch(out) _)` */
}
