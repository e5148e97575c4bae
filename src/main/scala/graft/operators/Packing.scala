package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: stream documents in a deterministic
  * pseudo-random order and cut the token stream into fixed-`budget`
  * sequences — the batch-shaping step between a cleaned corpus and a
  * trainer. A document belongs to the sequence its FIRST token lands in
  * (the streaming-pack convention: documents may straddle a boundary
  * rather than leave tail padding).
  *
  * The global running token count is order-dependent, so the naive form
  * is a windowless `ORDER BY` window — a single reducer streaming the
  * whole corpus (WindowExec "No Partition Defined", the straggler the
  * hot-key operators exist to kill). Instead, a DISTRIBUTED PREFIX SUM
  * over the order key itself: the order is (hashOrder(id, buckets), id),
  * so partitioning BY the hash bucket makes every partition a contiguous
  * slice of the global order. Phase 1 computes per-bucket local running
  * sums (window per bucket — parallel); phase 2 lag-carries per-bucket
  * totals into bucket start offsets on a `buckets`-row frame (tiny);
  * the broadcast join back shifts local sums to global ones. Three
  * narrow exchanges, none carrying more than the doc-level frame, no
  * single-reducer stage. Oracle-checked as q89 (DuckDB computes the
  * same stream with one window — fine at oracle scale, fatal at 100 TB).
  */
object Packing {

  /** One row per document: its sequence id, global token offset, and
    * token count, under `(hashOrder(idCol, buckets), idCol)` order.
    * `tokensCol` must be a non-negative numeric token count. */
  def packDocs(docs: DataFrame, idCol: String, tokensCol: String,
      budget: Long, buckets: Int = 97): DataFrame = {
    require(budget > 0)
    val hb = graft.Exact.hashOrder(col(idCol), buckets)
    val local = Window.partitionBy(col("_hb")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val partials = docs
      .select(col(idCol), col(tokensCol).cast("long").as("_toks"))
      .withColumn("_hb", hb)
      .withColumn("_lcum", sum(col("_toks")).over(local))
    // bucket totals → exclusive running offsets (buckets-row frame)
    val offsets = partials.groupBy(col("_hb"))
      .agg(sum(col("_toks")).as("_btot"))
      .withColumn("_boff", coalesce(sum(col("_btot")).over(
        Window.orderBy(col("_hb"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_hb"), col("_boff"))
    partials.join(broadcast(offsets), Seq("_hb"))
      .withColumn("_cum", col("_lcum") + col("_boff"))
      .select(
        col(idCol),
        col("_toks").as("n_tokens"),
        (col("_cum") - col("_toks")).as("token_offset"),
        expr(s"CAST((_cum - _toks) DIV $budget AS BIGINT)").as("seq_id"))
  }

  /** Per-sequence shape: document count, token mass, and the id range —
    * what a packer hands the trainer's data loader. */
  def packSequences(docs: DataFrame, idCol: String, tokensCol: String,
      budget: Long, buckets: Int = 97): DataFrame =
    packDocs(docs, idCol, tokensCol, budget, buckets)
      .groupBy(col("seq_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col(idCol)).as("min_doc_id"),
        max(col(idCol)).as("max_doc_id"))
}
