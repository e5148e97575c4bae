package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property checks for the two-phase hot-key window operators: for
  * RANDOM event sets (duplicate timestamps, boundary-exact gaps, empty
  * buckets, singleton users) and random bucket sizes, the bucketed
  * forms must equal the single-window forms exactly. Generators are
  * ScalaCheck, driven deterministically (fixed seed), evaluated through
  * the real Spark plans. */
class BucketedPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int, seed: Long): List[A] =
    Iterator.iterate((Seed(seed), List.empty[A])) { case (s, acc) =>
      val r = gen.doPureApply(Gen.Parameters.default, s)
      (r.seed.next, r.retrieve.fold(acc)(_ :: acc))
    }.drop(n).next()._2

  private val gapUs = 1000L // tiny gap so random times form many sessions

  /** Events over a handful of users; times cluster around multiples of
    * the gap so boundary-exact differences (== gap, == gap+1) occur. */
  private def eventGen: Gen[(Long, Long, Long)] = for {
    user <- Gen.choose(1L, 5L)
    slot <- Gen.choose(0L, 40L)
    jitter <- Gen.oneOf(0L, 1L, gapUs - 1, gapUs, gapUs + 1, 3 * gapUs)
  } yield (user, 0L, slot * gapUs + jitter)

  test("sessionizeBucketed == sessionize for random event sets and bucket sizes") {
    for (seed <- 1L to 4L) {
      val rows = samples(eventGen, 300, seed).zipWithIndex
        .map { case ((u, _, t), i) => (u, i.toLong, t) }
      val df = rows.toDF("user_id", "event_id", "us")
      val plain = Sessionize.sessionize(df, "user_id", "event_id", "us", gapUs)
      for (bucket <- Seq(gapUs, 2 * gapUs + 1, 7 * gapUs)) {
        val bucketed = Sessionize.sessionizeBucketed(
          df, "user_id", "event_id", "us", gapUs, bucket)
        assertSameRows(plain, bucketed, s"seed=$seed bucket=$bucket")
      }
    }
  }

  test("asofBackwardBucketed == asofBackward for random event sets and bucket sizes") {
    for (seed <- 10L to 12L) {
      val rows = samples(eventGen, 300, seed).zipWithIndex
        .map { case ((u, _, t), i) => (u, i.toLong, t) }
      val df = rows.toDF("user_id", "event_id", "us")
      val left = df
      // rights: sparse, deduped per (user, time) as the contract requires
      val right = df.filter(col("event_id") % 4 === 0)
        .groupBy(col("user_id"), col("us"))
        .agg(max(col("event_id")).as("ref_id"))
      val plain = AsofJoin.asofBackward(left, right, "user_id", "us", Seq("ref_id"))
      for (bucket <- Seq(1L, gapUs, 13 * gapUs)) {
        val bucketed = AsofJoin.asofBackwardBucketed(
          left, right, "user_id", "us", Seq("ref_id"), bucket)
        assertSameRows(plain, bucketed, s"seed=$seed bucket=$bucket")
      }
    }
  }
}
