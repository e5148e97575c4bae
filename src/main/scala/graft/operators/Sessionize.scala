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
  *     phase 2 numbers sessions globally with ONE window directly over
  *     the session-level partials ordered by (bucket, local_seq): the
  *     gap test `first_us - lag(last_us) > gapUs` holds uniformly —
  *     within a bucket a new local session exists precisely because the
  *     gap was exceeded, and across buckets it is exactly the stitch
  *     condition. Requires bucketUs ≥ gapUs so a session can only
  *     continue into the NEXT non-empty bucket: with any empty bucket
  *     between, the time gap is ≥ bucketUs ≥ gapUs, so the same
  *     predicate closes the session.
  *     Phase 2 runs on partial-session rows (≪ events; for the hot key,
  *     at most span/bucketUs + its true session count), so the per-user
  *     window that made the plain form a straggler is event-free here.
  *     No caching, no join: partials flow straight into the second
  *     window (2 shuffles total; the final groupBy reuses the phase-2
  *     hash partitioning). Results are identical to [[sessionize]] for
  *     any bucket size (asserted in SkewSpec and oracle-checked as q52). */
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
    // phase 2: global numbering with one window straight over the
    // session-level partials in (_b, _lseq) order. The SAME gap test
    // decides both cases (see object doc): a partial with _lseq > 1
    // always fails it (its local session opened because the gap was
    // exceeded), a bucket-first partial passes it exactly when it
    // continues the previous bucket's last session. Running-sum the
    // starts → global session_seq. One row per partial session — no
    // event-scale data, no cache, no join-back.
    val w2 = Window.partitionBy(col("_u")).orderBy(col("_b"), col("_lseq"))
    val run2 = w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    partials
      .withColumn("_gnew",
        when(lag(col("_maxus"), 1).over(w2).isNull ||
          col("_minus") - lag(col("_maxus"), 1).over(w2) > gapUs, 1).otherwise(0))
      .withColumn("session_seq", sum(col("_gnew")).over(run2).cast("long"))
      // phase 3: merge partials under the global numbering — reuses the
      // phase-2 hash(_u) partitioning (subset of the grouping keys), so
      // this groupBy adds no exchange
      .groupBy(col("_u").as(userCol), col("session_seq"))
      .agg(
        sum(col("_n")).as("n_events"),
        min(col("_minid")).as("first_event_id"),
        (max(col("_maxus")) - min(col("_minus"))).cast("long").as("duration_us"))
  }
}
