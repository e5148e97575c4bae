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

  // ---- windowed hot-key paths (VERDICT r1 §Next 8): the bucketed
  // two-phase forms must be bit-identical to the single-window forms ----

  /** Hot-key event stream: user 1 owns ~80% of events, with gaps planted
    * both within and exactly across hour-bucket boundaries. */
  private lazy val events = {
    val rng = new scala.util.Random(7L)
    val hour = 3600000000L
    val hot = (0 until 2000).map { i =>
      // clusters near bucket edges + random spread → sessions that span
      // bucket boundaries, sessions that end exactly at them, singletons
      (1L, i.toLong, (i / 50) * hour + (rng.nextInt(4000) - 2000).toLong * 1000000L max 0L)
    }
    val cold = (0 until 200).map { i =>
      ((i % 9 + 2).toLong, 10000L + i, rng.nextLong(200L * hour).abs)
    }
    (hot ++ cold).toDF("user_id", "event_id", "us")
  }

  test("sessionizeBucketed == sessionize on a hot key, across bucket sizes") {
    val plain = Sessionize.sessionize(events, "user_id", "event_id", "us", 1800000000L)
    for (bucket <- Seq(1800000000L, 3600000000L, 7200000000L)) {
      val bucketed = Sessionize.sessionizeBucketed(
        events, "user_id", "event_id", "us", 1800000000L, bucket)
      assertSameRows(plain, bucketed, s"bucketed($bucket) vs plain sessionize")
    }
  }

  test("asofBackwardBucketed == asofBackward on a hot key, across bucket sizes") {
    val left = events.select(col("user_id"), col("event_id"), col("us"))
    val right = events.filter(col("event_id") % 5 === 0)
      .groupBy(col("user_id"), col("us"))
      .agg(max(col("event_id")).as("ref_id"))
    val plain = AsofJoin.asofBackward(left, right, "user_id", "us", Seq("ref_id"))
    for (bucket <- Seq(1000000L, 3600000000L, 86400000000L)) {
      val bucketed = AsofJoin.asofBackwardBucketed(
        left, right, "user_id", "us", Seq("ref_id"), bucket)
      assertSameRows(plain, bucketed, s"bucketed($bucket) vs plain asof")
    }
  }
}
