package graft.queries

import graft.SparkSpec

/** Catalog-level invariants for the LM-quality queries (the value-level
  * gate is the DuckDB oracle; these pin the bucket semantics q200's
  * threshold construction promises). */
class LmSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q200: buckets are ordered, exhaustive and head-heavy per language") {
    val rows = graft.SparkEntry.queries("q200_ccnet_ppl_buckets")(spark, sf)
      .select("lang", "ppl_fp", "bucket")
      .as[(String, Long, String)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._3).toSet.subsetOf(Set("head", "middle", "tail")))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val byBucket = rs.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
      val n = rs.length
      // threshold semantics: head ppl < middle ppl < tail ppl strictly
      // (ties share a bucket, so the ranges cannot interleave)
      for {
        hi <- byBucket.get("head").map(_.max)
        lo <- byBucket.get("middle").map(_.min)
      } assert(hi < lo, s"$lang: head/middle overlap")
      for {
        hi <- byBucket.get("middle").map(_.max)
        lo <- byBucket.get("tail").map(_.min)
      } assert(hi < lo, s"$lang: middle/tail overlap")
      // cumulative cutoff: head covers at least a third (ties round up)
      assert(byBucket.getOrElse("head", Array.empty[Long]).length * 3 >= n,
        s"$lang: head smaller than a tercile")
    }
  }
}
