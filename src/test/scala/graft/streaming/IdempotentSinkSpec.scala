package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The exactly-once batch-directory sink: re-delivered micro-batches
  * (foreachBatch's at-least-once contract) must not duplicate data,
  * torn attempts must be overwritten. */
class IdempotentSinkSpec extends SparkSpec {
  import spark.implicits._

  test("re-delivered batchId is skipped; torn attempt is repaired") {
    val out = java.nio.file.Files.createTempDirectory("graft-idem").toString
    val b0 = (1 to 10).toDF("v")
    IdempotentSink.writeBatch(out)(b0, 0L)
    // redelivery with different (late, replayed) content — must be a no-op
    IdempotentSink.writeBatch(out)((91 to 95).toDF("v"), 0L)
    assert(spark.read.parquet(out).count() == 10,
      "replayed batch 0 must not duplicate or overwrite")

    // a torn attempt: directory exists but no _SUCCESS marker
    val torn = new java.io.File(s"$out/batch=1")
    torn.mkdirs()
    java.nio.file.Files.writeString(torn.toPath.resolve("garbage.parquet"), "junk")
    IdempotentSink.writeBatch(out)((11 to 15).toDF("v"), 1L)
    val all = spark.read.parquet(out)
    assert(all.count() == 15)
    assert(all.filter(col("batch") === 1).count() == 5, "torn attempt repaired")
  }

  test("compacted-id ranges: coalescing, manifest round-trip, writeBatch skip") {
    // adjacency and overlap coalesce; gaps stay separate ranges
    assert(IdempotentSink.coalesceRanges(Nil, Seq(0L, 1L, 2L)) == Seq((0L, 2L)))
    assert(IdempotentSink.coalesceRanges(Seq((0L, 4L)), Seq(5L, 6L)) == Seq((0L, 6L)))
    assert(IdempotentSink.coalesceRanges(Seq((0L, 2L)), Seq(7L, 8L, 4L)) ==
      Seq((0L, 2L), (4L, 4L), (7L, 8L)))
    assert(IdempotentSink.coalesceRanges(Seq((0L, 5L), (3L, 9L)), Nil) == Seq((0L, 9L)))
    val base = java.nio.file.Files.createTempDirectory("graft-idem-man").toString
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(base)
    assert(IdempotentSink.compactedRanges(fs, p).isEmpty, "no manifest → empty")
    IdempotentSink.writeCompactedRanges(fs, p, Seq((0L, 3L), (7L, 7L)))
    assert(IdempotentSink.compactedRanges(fs, p) == Seq((0L, 3L), (7L, 7L)))
    assert(IdempotentSink.isCompacted(fs, p, 2L) && IdempotentSink.isCompacted(fs, p, 7L))
    assert(!IdempotentSink.isCompacted(fs, p, 5L))
    // a replay of a manifest-covered id writes nothing
    IdempotentSink.writeBatch(base)((1 to 5).toDF("v"), 2L)
    assert(!new java.io.File(s"$base/batch=2").exists(),
      "manifest-covered replay must not create a dir")
    // an uncovered id still lands
    IdempotentSink.writeBatch(base)((1 to 5).toDF("v"), 5L)
    assert(new java.io.File(s"$base/batch=5/_SUCCESS").exists())
  }

  test("wired as a real foreachBatch sink over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-idem-stream").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    mem.addData(1 to 25: _*)
    val q = mem.toDF().writeStream
      .foreachBatch(IdempotentSink.writeBatch(out) _)
      .option("checkpointLocation", s"$out/_cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.read.parquet(out).count() == 25)
  }
}
