package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (Some("a"), Some(1.0), 1L),
    (Some("a"), Some(Double.NaN), 1L),
    (None, Some(2.0), 2L),
    (Some("b"), None, 2L)).toDF("s", "d", "k")

  test("valueCounts orders by frequency then value") {
    val got = Profile.valueCounts(df, "s").as[(Option[String], Long)].collect().toSeq
    assert(got == Seq((Some("a"), 2L), (None, 1L), (Some("b"), 1L)))
  }

  test("nullCounts counts nulls and NaNs in one pass") {
    val r = Profile.nullCounts(df).head()
    assert(r.getLong(0) == 1L) // s: one null
    assert(r.getLong(1) == 2L) // d: one null + one NaN
    assert(r.getLong(2) == 0L)
  }

  test("distinctCounts exact and approx") {
    val exact = Profile.distinctCounts(df).head()
    assert(exact.getLong(2) == 2L)
    val approx = Profile.distinctCounts(df, approx = true).head()
    assert(approx.getLong(2) == 2L) // HLL exact at this cardinality
  }

  test("rowStats: duplicates counted") {
    val dup = df.union(df.limit(1))
    val r = Profile.rowStats(dup).head()
    assert(r.getLong(0) == 5L && r.getLong(1) == 4L && r.getLong(2) == 1L)
  }

  // Real-table sketch tests: the events table at sf0.001 (10k rows,
  // ~1k distinct users over 30 days) — big enough that HLL actually
  // estimates, small enough for an exact reference count.
  private lazy val events =
    graft.Tables.load(spark, "/root/testdata/sf0.001", "events")

  test("hllSlices + hllMergedDistinct: union of per-day sketches == one-shot sketch, within HLL error of exact") {
    import org.apache.spark.sql.functions._
    val exact = events.select(countDistinct(col("user_id"))).head().getLong(0)
    val slices = Profile.hllSlices(
      events.withColumn("day", to_date(col("ts"))), "day", "user_id")
    val merged = Profile.hllMergedDistinct(slices).head().getLong(0)
    val oneShot = events
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))))
      .head().getLong(0)
    // HLL union is register-wise max over same-lgK sketches, so the
    // merged estimate must EQUAL the single-pass sketch — the property
    // that makes incremental per-slice sketching sound at 100 TB.
    assert(merged == oneShot,
      s"union-of-sketches $merged != sketch-of-union $oneShot")
    // lgK=12 → ~1.6% RSE; 5% is > 3 standard errors
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged estimate $merged vs exact $exact beyond 5%")
  }

  test("countMinSketch: one-sided error bound against exact counts") {
    import org.apache.spark.sql.functions._
    val cms = Profile.countMinSketch(events, "event_type", eps = 0.001)
    val exact = events.groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    exact.foreach { case (k, n) =>
      val est = cms.estimateCount(k)
      assert(est >= n, s"CMS under-counted $k: $est < $n")
      assert(est <= n + (0.001 * total).ceil.toLong,
        s"CMS overshoot on $k: $est vs $n (bound ${(0.001 * total).ceil})")
    }
  }
}
