package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "small payload"),
    (1L, "a considerably larger payload with many more bytes in it, " +
      "padded well past two frame widths so the sampler emits multiple frames"),
    (2L, "ünïcode båit€s")).toDF("doc_id", "text")

  test("withPayload: binary column with utf-8 byte length, cyclic format") {
    val p = Multimodal.withPayload(docs, "doc_id", "text")
    assert(p.schema("payload").dataType.typeName == "binary")
    val rows = p.select(col("doc_id"), octet_length(col("payload")), col("format"))
      .as[(Long, Int, String)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(rows(0L) == ("small payload".getBytes("UTF-8").length, "jpeg"))
    assert(rows(2L)._1 == "ünïcode båit€s".getBytes("UTF-8").length)
    assert(rows(1L)._2 == "png" && rows(2L)._2 == "webp")
  }

  test("decodeStub: one metadata row per payload, deterministic dims") {
    val out = Multimodal.decodeStub(
      Multimodal.withPayload(docs, "doc_id", "text"), "doc_id")
    val rows = out.collect().map(m => m.doc_id -> m).toMap
    assert(rows.size == 3)
    assert(rows(0L).byte_len == "small payload".getBytes("UTF-8").length.toLong)
    assert(rows.values.forall(m => m.width >= 64 && m.height >= 64))
    // determinism: second run identical
    val again = Multimodal.decodeStub(
      Multimodal.withPayload(docs, "doc_id", "text"), "doc_id")
      .collect().map(m => m.doc_id -> m).toMap
    assert(rows == again)
  }

  test("frameSampleStub: one-to-many expansion with stride") {
    val out = Multimodal.frameSampleStub(
      Multimodal.withPayload(docs, "doc_id", "text"), "doc_id", everyNth = 1)
    val perDoc = out.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(perDoc(0L) == math.max(1, "small payload".getBytes("UTF-8").length / 32))
    assert(perDoc(1L) > perDoc(0L))
  }
}
