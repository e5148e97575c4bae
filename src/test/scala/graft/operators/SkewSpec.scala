package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: 90% of rows share key 1
  private lazy val large = ((1 to 900).map(i => (1L, s"v$i")) ++
    (1 to 100).map(i => ((i % 7 + 2).toLong, s"w$i"))).toDF("k", "payload")
  private lazy val small = (1L to 10L).map(k => (k, s"dim$k")).toDF("k", "name")

  test("saltedJoin == plain inner join on skewed keys") {
    val plain = large.join(small, Seq("k"))
    val salted = Skew.saltedJoin(large, small, "k", salts = 8)
    assertSameRows(plain, salted, "salted vs plain join")
  }

  test("skewAwareCount == plain groupBy count") {
    val plain = large.groupBy("k").agg(count(lit(1)).as("count"))
    val salted = Skew.skewAwareCount(large, "k", salts = 16)
    assertSameRows(plain, salted, "salted vs plain count")
  }

  test("salted small side is multiplied by exactly `salts`") {
    // structural check: every key of the small side appears once per salt
    val salted = Skew.saltedJoin(large.limit(0), small, "k", salts = 5)
    assert(salted.count() == 0) // no matches, but no error either
  }
}
