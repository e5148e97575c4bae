package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for each left row, the latest right row with
  * `right.time <= left.time` on the same key. Spark has no native as-of
  * join; per the preference order (SURVEY §7.3 / the build brief) this
  * composes existing operators instead of a custom SparkPlan:
  *
  *   union(tagged left ∪ tagged right)
  *     → window last(right_payload, ignoreNulls) over
  *       (PARTITION BY key ORDER BY time, side) — rights sort before
  *       lefts at equal time, so the match is inclusive
  *     → keep left rows.
  *
  * One shuffle on the key (the join itself would shuffle identically);
  * state per window is a single carried struct, so memory is O(1) per
  * partition stream, not O(rows). The right side must be unique per
  * (key, time) for deterministic results — dedupe first (e.g.
  * `Dedup.deterministicSample`-style keep-max rules) as the tests and
  * q51 do.
  *
  * [[asofBackwardBucketed]] is the hot-key variant (VERDICT r1 §Next 8):
  * a key holding a large fraction of all rows makes the per-key window a
  * one-reducer straggler. The backward-match semantics decompose exactly
  * by time bucket — a left row's match is either the last right within
  * its own (key, bucket), or the last right of the nearest earlier
  * non-empty bucket — so phase 1 windows over (key, bucket) [skew spread]
  * and phase 2 carries bucket-last payloads across per-bucket summaries
  * (one row per non-empty bucket). Identical results for ANY bucket size
  * (asserted in SkewSpec, oracle-checked as q53). */
object AsofJoin {

  /** Tagged union shared by both forms: (_k, _t, _side, _l, _r). */
  private def taggedUnion(
      left: DataFrame, right: DataFrame,
      key: String, time: String, rightCols: Seq[String]): DataFrame = {
    val leftStruct = struct(left.columns.map(col): _*).as("_l")
    val rightStruct = struct(rightCols.map(col): _*).as("_r")
    val lPrep = left.select(
      col(key).as("_k"), col(time).as("_t"), lit(1).as("_side"),
      leftStruct, lit(null).cast(right.select(rightCols.map(col): _*).schema
        .fields.foldLeft(new org.apache.spark.sql.types.StructType)(_ add _)).as("_r"))
    val rPrep = right.select(
      col(key).as("_k"), col(time).as("_t"), lit(0).as("_side"),
      lit(null).cast(left.schema
        .fields.foldLeft(new org.apache.spark.sql.types.StructType)(_ add _)).as("_l"),
      rightStruct)
    lPrep.unionByName(rPrep)
  }

  def asofBackward(
      left: DataFrame, right: DataFrame,
      key: String, time: String,
      rightCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedUnion(left, right, key, time, rightCols)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_l.*") +: rightCols.map(c => col(s"_asof.$c").as(s"asof_$c")): _*)
  }

  /** Two-phase hot-key form; see object doc. Times must be non-negative
    * (DIV truncates toward zero). */
  def asofBackwardBucketed(
      left: DataFrame, right: DataFrame,
      key: String, time: String,
      rightCols: Seq[String], bucket: Long): DataFrame = {
    require(bucket > 0)
    // referenced three times below (window input, per-bucket right
    // payloads, bucket spine) — cached columnar once; without it each
    // branch recomputes the whole union INCLUDING the right side's
    // upstream dedup shuffle
    val unioned = taggedUnion(left, right, key, time, rightCols)
      .withColumn("_b", expr(s"_t DIV $bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // phase 1: last right at-or-before, within each (key, bucket)
    val w1 = Window.partitionBy(col("_k"), col("_b")).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val localized = unioned
      .withColumn("_local", last(col("_r"), ignoreNulls = true).over(w1))
    // phase 2 reads only CHEAP aggregates of the union — not the
    // windowed frame — so the expensive phase-1 window subtree appears
    // exactly once in the plan (no AQE stage reuse exists across such
    // branches; re-deriving from `localized` would run the window
    // twice). Per-bucket last payload comes from the rights alone
    // (deterministic: rights are unique per (key, time) by contract);
    // the bucket spine covers EVERY non-empty (key, bucket) so left
    // rows in rightless buckets still find their carry row.
    val bucketLast = unioned.filter(col("_side") === 0)
      .groupBy(col("_k"), col("_b"))
      .agg(max_by(col("_r"), col("_t")).as("_blast"))
    val spine = unioned.groupBy(col("_k"), col("_b")).agg(lit(1).as("_one"))
    val carries = spine
      .join(bucketLast, Seq("_k", "_b"), "left")
      .withColumn("_carry", last(col("_blast"), ignoreNulls = true).over(
        Window.partitionBy(col("_k")).orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("_k"), col("_b"), col("_carry"))
    localized.join(carries, Seq("_k", "_b"))
      .filter(col("_side") === 1)
      .withColumn("_asof", coalesce(col("_local"), col("_carry")))
      .select(col("_l.*") +: rightCols.map(c => col(s"_asof.$c").as(s"asof_$c")): _*)
  }
}
