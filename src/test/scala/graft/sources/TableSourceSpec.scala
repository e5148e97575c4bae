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

  /** The landed topic files re-shaped as Kafka wire rows: binary
    * key/value plus the connector's metadata columns, exactly the
    * schema `format("kafka").load()` produces. */
  private def wireFrame(t: PipelineTable): org.apache.spark.sql.DataFrame =
    spark.read.text(s"$base/topics/${t.name}/partition=*")
      .select(
        lit(null).cast("binary").as("key"),
        encode(col("value"), "UTF-8").as("value"),
        lit(t.name).as("topic"),
        spark_partition_id().as("partition"),
        monotonically_increasing_id().as("offset"),
        current_timestamp().as("timestamp"),
        lit(0).as("timestampType"))

  test("Kafka decode contract: wire-shaped batch rows == file source, all tables") {
    for (t <- PipelineTable.all) {
      val decoded = KafkaTableSource.decode(wireFrame(t), t.schema)
      assert(decoded.schema == t.schema,
        s"decode must land the declared raw schema for ${t.name}")
      assertSameRows(decoded, FileJsonTableSource(base).readBatch(spark, t),
        s"kafka-wire decode vs file source for ${t.name}")
    }
  }

  /** The topic as a 3-partition Kafka LOG: records assigned round-robin,
    * offsets DENSE per partition from 0 — the invariants a real broker
    * guarantees and `startingOffsets=earliest` (the reference's Kinesis
    * `initialPosition=earliest`, Kinesis_Processing.ipynb:519) relies
    * on. Deterministic: row identity comes from the payload hash, not
    * file order. */
  private def multiPartitionLog(t: PipelineTable, nParts: Int = 3): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("partition")).orderBy(col("_h"))
    spark.read.text(s"$base/topics/${t.name}/partition=*")
      .select(col("value").as("_payload"), xxhash64(col("value")).as("_h"))
      .withColumn("partition", pmod(col("_h"), lit(nParts)).cast("int"))
      .withColumn("offset", row_number().over(w).cast("long") - 1)
      .select(
        lit(null).cast("binary").as("key"),
        encode(col("_payload"), "UTF-8").as("value"),
        lit(t.name).as("topic"), col("partition"), col("offset"),
        current_timestamp().as("timestamp"), lit(0).as("timestampType"))
  }

  test("Kafka earliest-offset replay: multi-partition log is complete, dense, and idempotent") {
    val t = PipelineTable.Pin
    val log = multiPartitionLog(t)
    // dense offsets from 0 per partition — the invariant earliest-replay
    // consumes (an offset gap would mean silently dropped records)
    val perPart = log.groupBy("partition")
      .agg(count(lit(1)).as("n"), min("offset").as("lo"), max("offset").as("hi"))
      .collect()
    assert(perPart.length == 3, "expected 3 partitions")
    perPart.foreach { r =>
      assert(r.getAs[Long]("lo") == 0L, s"partition ${r.get(0)}: earliest offset must be 0")
      assert(r.getAs[Long]("hi") == r.getAs[Long]("n") - 1,
        s"partition ${r.get(0)}: offsets must be dense")
    }
    // replay completeness: decoding the whole log == decoding each
    // partition's earliest→latest slice, unioned in any order
    val whole = KafkaTableSource.decode(log, t.schema)
    val bySlices = (0 until 3).map(p =>
        KafkaTableSource.decode(log.filter(col("partition") === p), t.schema))
      .reduce(_ unionByName _)
    assertSameRows(whole, bySlices, "whole-log decode vs per-partition slices")
    // idempotent: a second replay from earliest is bit-identical
    assertSameRows(whole, KafkaTableSource.decode(multiPartitionLog(t), t.schema),
      "two earliest replays must agree")
    // and the log carries exactly the landed topic's records
    assertSameRows(whole, FileJsonTableSource(base).readBatch(spark, t),
      "replayed log vs landed files")
  }

  test("Kafka resume contract: splitting each partition at an arbitrary offset loses nothing") {
    val t = PipelineTable.Geo
    val log = multiPartitionLog(t)
    // a checkpointed consumer resumes from per-partition offsets; the
    // pre-checkpoint batch plus the post-checkpoint batch must equal an
    // uninterrupted earliest read. Split points deliberately differ per
    // partition (offset < 7/13/29).
    val splitAt = Map(0 -> 7L, 1 -> 13L, 2 -> 29L)
    val splitCol = splitAt.foldLeft(lit(Long.MaxValue)) { case (acc, (p, o)) =>
      when(col("partition") === p, lit(o)).otherwise(acc)
    }
    val before = KafkaTableSource.decode(log.filter(col("offset") < splitCol), t.schema)
    val after = KafkaTableSource.decode(log.filter(col("offset") >= splitCol), t.schema)
    assertSameRows(before.unionByName(after),
      KafkaTableSource.decode(log, t.schema),
      "resume-split decode vs uninterrupted decode")
  }

  test("Kafka rebalance: reassignment at committed offsets loses and duplicates nothing") {
    val t = PipelineTable.User
    val log = multiPartitionLog(t)
    // generation 1: consumer A owns {0,1}, consumer B owns {2}; each
    // commits mid-partition (committed offset = NEXT offset to read,
    // Kafka semantics). A rebalance then reassigns: A' owns {0},
    // B' owns {1,2}, and each resumes its partitions AT the committed
    // offsets — partition 1 moves from A to B' mid-log. The four
    // consumed slices must tile the log exactly: union == whole,
    // pairwise disjoint on (partition, offset).
    val committed = Map(0 -> 11L, 1 -> 5L, 2 -> 17L)
    def slice(parts: Seq[Int], from: Map[Int, Long], to: Map[Int, Long]) =
      parts.map { p =>
        log.filter(col("partition") === p &&
          col("offset") >= from.getOrElse(p, 0L) &&
          col("offset") < to.getOrElse(p, Long.MaxValue))
      }.reduce(_ unionByName _)
    val zero = Map.empty[Int, Long]
    val gen1A = slice(Seq(0, 1), zero, committed)
    val gen1B = slice(Seq(2), zero, committed)
    val gen2A = slice(Seq(0), committed, zero)
    val gen2B = slice(Seq(1, 2), committed, zero)
    val consumed = Seq(gen1A, gen1B, gen2A, gen2B).reduce(_ unionByName _)
    assertSameRows(KafkaTableSource.decode(consumed, t.schema),
      KafkaTableSource.decode(log, t.schema),
      "rebalanced consumption vs uninterrupted log")
    // no (partition, offset) consumed twice across the generation change
    assert(consumed.groupBy("partition", "offset").count()
      .filter(col("count") > 1).isEmpty,
      "a record was delivered to two consumers across the rebalance")
  }

  test("Kafka commit recovery: crash before commit re-delivers; offset dedup restores exactly-once") {
    val t = PipelineTable.Geo
    val log = multiPartitionLog(t)
    // at-least-once: the consumer PROCESSES through offset 20 but
    // crashes having only COMMITTED 12 — restart resumes at 12 and
    // offsets [12, 20) arrive twice. The raw delivery stream must show
    // exactly that duplication (nothing lost), and keying by
    // (partition, offset) — what IdempotentSink does with batch ids —
    // must collapse it back to exactly-once.
    val processedTo = 20L
    val committedTo = 12L
    val p0 = col("partition") === 0
    val beforeCrash = log.filter(p0 && col("offset") < processedTo)
    val afterRestart = log.filter(p0 && col("offset") >= committedTo)
    val delivered = beforeCrash.unionByName(afterRestart)
    val redelivered = delivered.groupBy("partition", "offset").count()
      .filter(col("count") > 1)
    assert(redelivered.count() == processedTo - committedTo,
      "exactly the uncommitted processed span must re-deliver")
    assertSameRows(
      KafkaTableSource.decode(
        delivered.dropDuplicates("partition", "offset"), t.schema),
      KafkaTableSource.decode(log.filter(p0), t.schema),
      "offset-keyed dedup must restore exactly-once for the partition")
  }

  test("Kafka decode contract: streaming micro-batch decodes like batch") {
    import spark.implicits._
    val jsons = spark.read.text(s"$base/topics/pin/partition=*")
      .as[String].collect().toSeq
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    mem.addData(jsons)
    val wire = mem.toDF().select(
      lit(null).cast("binary").as("key"),
      encode(col("value"), "UTF-8").as("value"),
      lit("pin").as("topic"), lit(0).as("partition"),
      xxhash64(col("value")).as("offset"),
      current_timestamp().as("timestamp"), lit(0).as("timestampType"))
    val decoded = KafkaTableSource.decode(wire, PipelineTable.Pin.schema)
    assert(decoded.isStreaming, "decode must preserve streaming-ness")
    val q = decoded.writeStream.format("memory")
      .queryName("kafka_decode_contract")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assertSameRows(
      spark.table("kafka_decode_contract"),
      KafkaTableSource.decode(wireFrame(PipelineTable.Pin), PipelineTable.Pin.schema),
      "streamed decode vs batch decode")
  }
}
