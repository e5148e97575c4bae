package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance — the nightly move of
  * a 100 TB warehouse: keep an additive rollup (counts + sums at a
  * fixed grain) current by folding in each day's delta WITHOUT
  * re-reading history. The algebra is partial aggregation itself:
  * `partial()` reduces rows to the rollup grain, and `merge()`
  * re-aggregates state ∪ delta-partial — SUM/COUNT associativity and
  * commutativity make `merge(partial(A), partial(B)) ≡ partial(A ∪ B)`
  * for ANY split, which q147 pins under the DuckDB hash oracle (the
  * oracle aggregates the full table from scratch).
  *
  * Scale shape: the delta is scanned once and collapses map-side to
  * ≤ |grain| × partitions rows; the state is already at the grain
  * (orders of magnitude smaller than the fact history); the merge
  * shuffle moves only grain-sized partials. History is never re-read.
  * Only ADDITIVE measures belong here — percentiles/distincts need
  * sketch state (Profile's HLL / approx_percentile buffers) instead. */
object Rollup {

  /** Collapse raw rows to the rollup grain: one row per `keys` with
    * `n_rows` plus a SUM per named measure. */
  def partial(rows: DataFrame, keys: Seq[String],
      sums: Seq[(String, Column)]): DataFrame = {
    require(keys.nonEmpty && sums.nonEmpty)
    rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sums.map { case (name, c) => sum(c).as(name) }: _*)
  }

  /** Fold a delta partial into the state: every non-key column is
    * additive by construction, so the merge is union + re-SUM. */
  def merge(state: DataFrame, deltaPartial: DataFrame,
      keys: Seq[String]): DataFrame = {
    val measures = state.columns.filterNot(keys.contains)
    require(measures.nonEmpty && state.columns.sorted.sameElements(
      deltaPartial.columns.sorted), "state/delta schemas must match")
    state.unionByName(deltaPartial)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(measures.head)).as(measures.head),
        measures.tail.map(c => sum(col(c)).as(c)): _*)
  }
}
