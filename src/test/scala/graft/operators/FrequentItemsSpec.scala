package graft.operators

import graft.SparkSpec

class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: capacity >= distinct items reproduces exact counts") {
    val words = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(7)("c") ++
      Seq.fill(13)("d")
    val got = words.toDS.repartition(5)
      .select(new MisraGries(64).toColumn).head()
    assert(got == Map("a" -> 50L, "b" -> 30L, "c" -> 7L, "d" -> 13L))
  }

  test("streaming: incremental micro-batch merges reproduce batch-exact counts") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(String, String)]
    val q = mem.toDS().groupByKey(_._1).mapValues(_._2)
      .agg(new MisraGries(64).toColumn)
      .writeStream.queryName("mg_stream").format("memory")
      .outputMode("complete").start()
    try {
      mem.addData(Seq.fill(10)(("en", "a")) ++ Seq.fill(3)(("en", "b")): _*)
      q.processAllAvailable()
      mem.addData(Seq.fill(5)(("en", "a")) ++ Seq.fill(7)(("de", "c")): _*)
      q.processAllAvailable()
      val got = spark.table("mg_stream")
        .as[(String, Map[String, Long])].collect().toMap
      assert(got == Map(
        "en" -> Map("a" -> 15L, "b" -> 3L),
        "de" -> Map("c" -> 7L)), s"got $got")
    } finally q.stop()
  }

  test("q124 skew-split join (MG heavy head broadcast) == naive token join") {
    import org.apache.spark.sql.functions._
    // the default path splits the token join-back on a Misra-Gries
    // head whose candidate SET is partition-order dependent — the
    // OUTPUT must be bit-identical to the naive single-join plan
    // regardless of which tokens land in the head
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q124_rare_token_profile")(spark, dir)
    val tok = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        explode(split(graft.functions.TextFunctions.normalizeText(col("text")), " "))
          .as("w"))
      .distinct()
    val naive = tok.join(tok.groupBy(col("w")).agg(count(lit(1)).as("df")), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_distinct_tokens"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(col("df")).cast("long").as("sum_df"))
    assertSameRows(got, naive, "q124 MG-split vs naive")
  }

  test("approximate regime: MG frequency guarantee holds under partitioned merge") {
    // n = 100, k = 2 -> threshold n/(k+1) = 33.3: "a" (50) MUST survive;
    // reported counts under-estimate by at most the threshold
    val words = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++
      (1 to 20).map(i => s"u$i")
    val got = words.toDS.repartition(7)
      .select(new MisraGries(2).toColumn).head()
    assert(got.size <= 2, s"state must stay bounded: $got")
    assert(got.contains("a"), s"item above n/(k+1) must survive: $got")
    assert(got("a") <= 50 && got("a") >= 50 - 34,
      s"count must under-estimate by at most n/(k+1): $got")
  }
}
