package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inactivity-gap sessionization (the q50 shape: reference W5-style
  * running windows composed into sessions).
  *
  * Two forms:
  *   - [[sessionize]]: one window per user — single shuffle, O(1)
  *     carried state; the right default.
  *   - [[sessionizeBucketed]]: the hot-key variant (VERDICT r1 §Next 8).
  *     A user with billions of events makes the per-user window a
  *     straggler: one reducer must stream the whole key. Salting can't
  *     be applied naively — session numbering is order-dependent across
  *     the full per-user stream — so this decomposes by TIME BUCKET:
  *     phase 1 windows over (user, bucket) [the skew-spreading step],
  *     phase 2 stitches sessions across bucket boundaries on per-bucket
  *     summaries (one row per non-empty bucket — tiny), phase 3 merges
  *     session partials. Requires bucketUs ≥ gapUs so a session can only
  *     continue into the NEXT non-empty bucket: with any empty bucket
  *     between, the time gap is ≥ bucketUs ≥ gapUs, except exactly at
  *     equality, which the consecutive-summary LAG still handles since
  *     summaries exist only for non-empty buckets.
  *     Results are identical to [[sessionize]] for any bucket size
  *     (asserted in SkewSpec and oracle-checked as q52). */
object Sessionize {

  /** Single-window form. Output: (userCol, session_seq, n_events,
    * first_event_id, duration_us); session_seq is 1-based per user in
    * time order, ties broken by idCol. */
  def sessionize(events: DataFrame, userCol: String, idCol: String,
      usCol: String, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(usCol), col(idCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col(userCol), col(idCol), col(usCol))
      .withColumn("_new",
        when(lag(col(usCol), 1).over(w).isNull ||
          col(usCol) - lag(col(usCol), 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("session_seq", sum(col("_new")).over(run).cast("long"))
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(idCol)).as("first_event_id"),
        (max(col(usCol)) - min(col(usCol))).cast("long").as("duration_us"))
  }

  /** Two-phase hot-key form; see object doc. Timestamps must be
    * non-negative microseconds (DIV truncates toward zero). */
  def sessionizeBucketed(events: DataFrame, userCol: String, idCol: String,
      usCol: String, gapUs: Long, bucketUs: Long): DataFrame = {
    require(bucketUs >= gapUs,
      s"bucketUs ($bucketUs) must be >= gapUs ($gapUs) so sessions span at most one boundary")
    val withB = events
      .select(col(userCol).as("_u"), col(idCol).as("_id"), col(usCol).as("_us"))
      .withColumn("_b", expr(s"_us DIV $bucketUs"))
    // phase 1: per-(user, bucket) windows — the hot user's stream is
    // spread over (span / bucketUs) reducers instead of one
    val w1 = Window.partitionBy(col("_u"), col("_b")).orderBy(col("_us"), col("_id"))
    val run1 = w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val partials = withB
      .withColumn("_new",
        when(lag(col("_us"), 1).over(w1).isNull ||
          col("_us") - lag(col("_us"), 1).over(w1) > gapUs, 1).otherwise(0))
      .withColumn("_lseq", sum(col("_new")).over(run1))
      .groupBy(col("_u"), col("_b"), col("_lseq"))
      .agg(count(lit(1)).as("_n"), min(col("_id")).as("_minid"),
        min(col("_us")).as("_minus"), max(col("_us")).as("_maxus"))
      // both phase 2 (summaries) and phase 3 (final merge) read the
      // session partials; the lazy columnar persist computes the
      // event-scale window ONCE and caches the (much smaller)
      // session-level frame — without it the full phase-1 subtree runs
      // twice (verified: no AQE stage reuse across the two branches)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // phase 2: stitch across boundaries on per-bucket summaries.
    // offset(b) = sessions counted before b, minus one per boundary
    // merge up to and including b — so a bucket whose first local
    // session continues the previous bucket's last session maps local 1
    // onto that session's global number.
    val summaries = partials.groupBy(col("_u"), col("_b"))
      .agg(min(col("_minus")).as("_first"), max(col("_maxus")).as("_last"),
        max(col("_lseq")).as("_nsess"))
    val w2 = Window.partitionBy(col("_u")).orderBy(col("_b"))
    val offsets = summaries
      .withColumn("_merged",
        when(col("_first") - lag(col("_last"), 1).over(w2) <= gapUs, 1).otherwise(0))
      .withColumn("_offset",
        coalesce(sum(col("_nsess")).over(w2.rowsBetween(Window.unboundedPreceding, -1)), lit(0))
          - sum(col("_merged")).over(w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("_u"), col("_b"), col("_offset"))
    // phase 3: merge session partials under global numbering — operates
    // on one row per (bucket, local session), not per event
    partials.join(offsets, Seq("_u", "_b"))
      .groupBy(col("_u").as(userCol), (col("_offset") + col("_lseq")).cast("long").as("session_seq"))
      .agg(
        sum(col("_n")).as("n_events"),
        min(col("_minid")).as("first_event_id"),
        (max(col("_maxus")) - min(col("_minus"))).cast("long").as("duration_us"))
  }
}
