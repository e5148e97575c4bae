package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The transport seam (SURVEY §7.1.2): batch and stream reads of the
  * same landed data agree through the trait, and the Kafka-shaped
  * implementation's option wiring reaches Spark's source resolver. */
class TableSourceSpec extends SparkSpec {

  private lazy val base: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-source-fixtures")
    EmulatorGenerator.writeTopicLayout(dir, n = 120, seed = 99L)
    dir.toString
  }

  test("FileJsonTableSource batch read equals the direct JsonSource read") {
    val src = FileJsonTableSource(base)
    for (t <- PipelineTable.all) {
      val viaTrait = src.readBatch(spark, t)
      val direct = JsonSource.readTopic(spark, base, t.name, t.schema)
      assertSameRows(viaTrait, direct, s"trait vs direct batch read of ${t.name}")
    }
  }

  test("FileJsonTableSource stream read sees the same rows as batch (AvailableNow)") {
    val src = FileJsonTableSource(base)
    val out = java.nio.file.Files.createTempDirectory("graft-source-stream")
    val q = graft.streaming.StreamPipeline.writeStream(
      graft.pipeline.Clean.pin(src.readStream(spark, PipelineTable.Pin)),
      out.toString, "pin")
    q.awaitTermination()
    val streamed = spark.read.parquet(s"$out/data/pin")
    val batch = graft.pipeline.Clean.pin(src.readBatch(spark, PipelineTable.Pin))
    assertSameRows(streamed, batch, "stream vs batch through the seam")
  }

  test("KafkaTableSource wiring reaches the source resolver (connector jar absent)") {
    val src = KafkaTableSource("broker:9092", topicPrefix = "0af.")
    val e = intercept[Exception] {
      src.readBatch(spark, PipelineTable.Pin).collect()
    }
    assert(e.getMessage.toLowerCase.contains("kafka"),
      s"expected the kafka source lookup to be attempted, got: ${e.getMessage}")
  }
}
