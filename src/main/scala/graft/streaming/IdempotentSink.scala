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

  /** Attach to a stream: `.writeStream.foreachBatch(IdempotentSink.writeBatch(out) _)` */
}
