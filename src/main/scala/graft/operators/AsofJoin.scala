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
  * non-empty bucket. Rather than join that carried payload back onto the
  * event-scale stream, the carry is INJECTED into the stream: per-bucket
  * last-right payloads (aggregated straight off the right side, no union
  * scan) are lag-carried along a bucket spine, and each carry becomes a
  * synthetic right row at its bucket's start time with `_side = -1` so
  * it sorts before every real row of the bucket. One (key, bucket)
  * window over union(left, right, carries) then resolves every left row
  * exactly as the plain form does — no event-scale join, no caching; the
  * only event-scale exchanges are the window shuffle itself (which the
  * plain form also pays, on a hotter key) and a 2-column distinct for
  * the spine. Identical results for ANY bucket size (asserted in
  * SkewSpec, oracle-checked as q53). */
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
    val unioned = taggedUnion(left, right, key, time, rightCols)
      .withColumn("_b", expr(s"_t DIV $bucket"))
    // per-bucket last right payload, aggregated straight off the right
    // side (rights are unique per (key, time) by contract, so max_by is
    // deterministic) — never touches the left-scale stream
    val rPrep = right.select(col(key).as("_k"), col(time).as("_t"),
        struct(rightCols.map(col): _*).as("_r"))
      .withColumn("_b", expr(s"_t DIV $bucket"))
    val bucketLast = rPrep.groupBy(col("_k"), col("_b"))
      .agg(max_by(col("_r"), col("_t")).as("_blast"))
    // bucket spine: every non-empty (key, bucket) on either side. The
    // left scan here prunes to (key, time) only — 2 columns. Needed so
    // a left-only bucket still receives its carry row.
    val spine = left.select(col(key).as("_k"), col(time).as("_t"))
      .withColumn("_b", expr(s"_t DIV $bucket")).select("_k", "_b")
      .union(rPrep.select("_k", "_b"))
      .distinct()
    // carry for bucket b = last right payload of any STRICTLY earlier
    // bucket (rights inside b itself are at _t ≥ b*bucket and win via
    // the window below). Bucket-level rows — tiny.
    val carries = spine.join(bucketLast, Seq("_k", "_b"), "left")
      .withColumn("_carry", last(col("_blast"), ignoreNulls = true).over(
        Window.partitionBy(col("_k")).orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("_carry").isNotNull)
    // inject each carry as a synthetic right row at its bucket's start:
    // _side = -1 sorts it before every real right (0) and left (1) of
    // the bucket, so `last(_r)` picks a local right over the carry
    // whenever one is at-or-before the left row
    val carryRows = carries.select(
      col("_k"),
      (col("_b") * bucket).cast(unioned.schema("_t").dataType).as("_t"),
      lit(-1).as("_side"),
      lit(null).cast(unioned.schema("_l").dataType).as("_l"),
      col("_carry").as("_r"),
      col("_b"))
    val w1 = Window.partitionBy(col("_k"), col("_b")).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned.unionByName(carryRows)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w1))
      .filter(col("_side") === 1)
      .select(col("_l.*") +: rightCols.map(c => col(s"_asof.$c").as(s"asof_$c")): _*)
  }
}
