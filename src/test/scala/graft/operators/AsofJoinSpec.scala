package graft.operators

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asofBackward: latest right at-or-before, inclusive, null before first") {
    val purchases = Seq(
      (1L, 100L, 3L), (1L, 101L, 5L), (1L, 102L, 0L), // user 1 at t=3,5,0
      (2L, 200L, 9L)                                  // user 2 with no signup
    ).toDF("user_id", "event_id", "us")
    val signups = Seq(
      (1L, 10L, 1L), (1L, 11L, 5L) // user 1 signups at t=1 and t=5
    ).toDF("user_id", "signup_event_id", "us")
      .select($"user_id", $"us", $"signup_event_id")

    val got = AsofJoin.asofBackward(purchases, signups, "user_id", "us",
      Seq("signup_event_id"))
      .select("event_id", "asof_signup_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got(100L).contains(10L), "t=3 matches signup at t=1")
    assert(got(101L).contains(11L), "t=5 matches signup AT t=5 (inclusive)")
    assert(got(102L).isEmpty, "t=0 precedes all signups")
    assert(got(200L).isEmpty, "no signups for user 2")
  }

  test("asofBackward deterministic across partitionings") {
    val l = (1L to 500L).map(i => (i % 7, i, i * 3 % 101)).toDF("k", "id", "us")
    val r = (1L to 80L).map(i => (i % 7, 1000 + i, i * 5 % 97)).toDF("k", "rid", "us")
      .groupBy("k", "us").agg(org.apache.spark.sql.functions.max("rid").as("rid"))
    val a = AsofJoin.asofBackward(l.repartition(9), r, "k", "us", Seq("rid"))
    val b = AsofJoin.asofBackward(l.repartition(2), r.repartition(5), "k", "us", Seq("rid"))
    assertSameRows(a, b, "asof across partitionings")
  }
}
