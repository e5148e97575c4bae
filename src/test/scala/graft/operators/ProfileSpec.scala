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
}
