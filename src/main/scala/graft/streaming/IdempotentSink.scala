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

  def writeBatch(outBase: String)(df: DataFrame, batchId: Long): Unit = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(s"$outBase/batch=$batchId")
    val fs = dir.getFileSystem(conf)
    val marker = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
    if (!fs.exists(marker)) {
      // overwrite handles a torn previous attempt (dir without marker)
      df.write.mode("overwrite").parquet(dir.toString)
    }
  }

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
