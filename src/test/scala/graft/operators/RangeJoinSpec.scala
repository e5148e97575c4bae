package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucket-decomposed range join vs the naive cross-join reference:
  * identical matches for any bucket size, boundary inclusivity, and an
  * equi-join (never BNLJ) plan. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 0L), (2L, 50L), (3L, 100L), (4L, 150L), (5L, 250L), (6L, 999L)
  ).toDF("pid", "t")

  // nested, touching, inverted, and multi-bucket-span intervals
  private lazy val intervals = Seq(
    (10L, 0L, 100L),    // inclusive both ends: catches t=0, 50, 100
    (11L, 100L, 150L),  // touches interval 10 at t=100
    (12L, 40L, 60L),    // nested inside 10
    (13L, 500L, 400L),  // inverted → matches nothing
    (14L, 0L, 999L)     // spans every bucket
  ).toDF("iid", "s", "e")

  private def reference = points.crossJoin(intervals)
    .filter(col("t") >= col("s") && col("t") <= col("e"))
    .select(col("pid"), col("iid").as("ival_iid"))

  test("matches == naive cross-join reference for several bucket sizes") {
    for (bucket <- Seq(1L, 7L, 64L, 1000L, 5000L)) {
      val got = RangeJoin.pointInInterval(points, "t", intervals, "s", "e", bucket)
        .select(col("pid"), col("ival_iid"))
      assertSameRows(got, reference, s"bucket=$bucket")
    }
  }

  test("equi-keys restrict matches and survive the prefixing") {
    val kp = points.withColumn("grp", col("pid") % 2)
    val ki = intervals.withColumn("grp", col("iid") % 2)
    val got = RangeJoin.pointInInterval(kp, "t", ki, "s", "e",
        bucket = 64L, keys = Seq("grp"))
      .select(col("pid"), col("ival_iid"))
    val ref = kp.crossJoin(ki.toDF(ki.columns.map("ival_" + _): _*))
      .filter(col("t") >= col("ival_s") && col("t") <= col("ival_e") &&
        col("grp") === col("ival_grp"))
      .select(col("pid"), col("ival_iid"))
    assertSameRows(got, ref, "keyed range join")
  }

  test("plan is an equi-join on the cell, never a nested loop") {
    val p = RangeJoin.pointInInterval(points, "t", intervals, "s", "e", 64L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must decompose to an equi-join:\n$p")
  }
}
