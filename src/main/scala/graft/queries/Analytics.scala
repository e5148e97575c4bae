package graft.queries

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._

/** Corpus-analytics additions (round 10): boilerplate shingle
  * detection, robust (winsorized) aggregation, fixed-point PageRank,
  * and bigram frequency ranking. Each entry is oracled in DuckDB.
  *
  * Determinism rules as in [[graft.QuerySpec]]: integer arithmetic or
  * cents for anything compared; quantile doubles are floored to BIGINT
  * before use; explicit tiebreaks wherever a rank makes row identity
  * observable.
  */
object Analytics {

  /** DuckDB twin of [[graft.functions.TextFunctions.shingles]] over a
    * text column: normalized whitespace tokens, n-gram join by single
    * spaces, whole-text fallback when the document is shorter than n.
    * (q85's oracle inlines the ≥n case only; the CASE here mirrors the
    * Spark helper exactly so short/empty docs stay in lockstep.) */
  private def shinglesSql(n: Int): String = s"""
    CASE WHEN len(t) < $n THEN [array_to_string(t, ' ')]
         ELSE list_transform(generate_series(1, len(t) - ${n - 1}),
                p -> array_to_string(t[p:p+${n - 1}], ' ')) END"""

  private val tokensSql: String =
    """string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')"""

  /** DuckDB twin of [[graft.operators.Search.log2FpExpr]] (the
    * catalog-wide 16-fractional-bit exact log2 construction). */
  private def log2FpSql(x: String): String = {
    val msb = s"(length(bin(CAST($x AS BIGINT))) - 1)"
    val pow = s"(CAST(1 AS BIGINT) << $msb)"
    s"(CAST($msb AS BIGINT) * 65536 + ((($x) - $pow) * 65536) // $pow)"
  }

  // PageRank fixed-point constants (shared by engine call + oracle)
  private val prScale = 1000000000L
  private val prIters = 5

  def specs: Seq[QuerySpec] = Seq(

    // ---- q139: boilerplate shingle detection (CCNet/RefinedWeb line-
    // dedup analogue at the n-gram grain) — word bigrams appearing in
    // ≥5 distinct documents of the same source are template chrome.
    // array_distinct BEFORE explode bounds the fan-out by distinct
    // shingles per doc; the single shuffle is the (source, shingle)
    // count with map-side combine; text never moves. ----
    QuerySpec(
      "q139_boilerplate_shingles",
      Some(s"""
        WITH toks AS (
          SELECT doc_id, source, $tokensSql AS t FROM documents),
        grams AS (
          SELECT doc_id, source,
                 unnest(list_distinct(${shinglesSql(2)})) AS shingle
          FROM toks)
        SELECT source, shingle, COUNT(*) AS n_docs
        FROM grams GROUP BY source, shingle
        HAVING COUNT(*) >= 5"""),
      (s, dir) =>
        graft.operators.CorpusPrep.boilerplateShingles(
          Tables.load(s, dir, "documents"), "source", "text",
          n = 2, minDocs = 5)),

    // ---- q140: winsorized robust aggregation — clip each event's
    // value to its type's [p05, p95] band before summing, the outlier-
    // robust statistic a metrics pipeline publishes. Two passes: the
    // per-type band (tiny: one row per type, exact percentile as in
    // q94, FLOORed to integer cents so the clip and the sum are pure
    // int64) broadcast back into a single scan of the events. ----
    QuerySpec(
      "q140_winsorized_event_stats",
      Some(s"""
        WITH c AS (
          SELECT event_type, ${graft.Exact.centsSql("value")} AS cents
          FROM events),
        b AS (
          SELECT event_type,
                 CAST(FLOOR(QUANTILE_CONT(cents, 0.05)) AS BIGINT) AS lo_cents,
                 CAST(FLOOR(QUANTILE_CONT(cents, 0.95)) AS BIGINT) AS hi_cents
          FROM c GROUP BY event_type)
        SELECT c.event_type, COUNT(*) AS n,
               b.lo_cents, b.hi_cents,
               CAST(SUM(GREATEST(b.lo_cents, LEAST(b.hi_cents, c.cents))) AS BIGINT)
                 AS winsorized_cents,
               CAST(SUM(CASE WHEN c.cents < b.lo_cents THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_clipped_lo,
               CAST(SUM(CASE WHEN c.cents > b.hi_cents THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_clipped_hi
        FROM c JOIN b USING (event_type)
        GROUP BY c.event_type, b.lo_cents, b.hi_cents"""),
      (s, dir) => {
        Tables.load(s, dir, "events").createOrReplaceTempView("events_q140")
        // percentile_cont WITHIN GROUP matches DuckDB QUANTILE_CONT
        // bit-for-bit on integer-cents input (q94); FLOOR pins the band
        // to int64 so the clipped sum is order-insensitive. The band is
        // one row per event_type — Catalyst broadcasts it into the
        // second scan (verified BroadcastHashJoin; never a shuffle).
        s.sql("""
          WITH c AS (
            SELECT event_type, CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
            FROM events_q140),
          b AS (
            SELECT event_type,
                   CAST(FLOOR(percentile_cont(0.05) WITHIN GROUP (ORDER BY cents)) AS BIGINT) AS lo_cents,
                   CAST(FLOOR(percentile_cont(0.95) WITHIN GROUP (ORDER BY cents)) AS BIGINT) AS hi_cents
            FROM c GROUP BY event_type)
          SELECT c.event_type, COUNT(*) AS n,
                 b.lo_cents, b.hi_cents,
                 SUM(GREATEST(b.lo_cents, LEAST(b.hi_cents, c.cents))) AS winsorized_cents,
                 SUM(CASE WHEN c.cents < b.lo_cents THEN 1 ELSE 0 END) AS n_clipped_lo,
                 SUM(CASE WHEN c.cents > b.hi_cents THEN 1 ELSE 0 END) AS n_clipped_hi
          FROM c JOIN b USING (event_type)
          GROUP BY c.event_type, b.lo_cents, b.hi_cents""")
      }),

    // ---- q141: domain-authority PageRank (fixed point) — power
    // iteration over the nation→nation trade graph (supplier nation →
    // customer nation, edge weight = line items shipped). All int64:
    // shares quantized to millionths, damping 85/100, K=5 rounds — so
    // the DuckDB recursive CTE replays the exact floor placements and
    // the gate is a hash match, rare for an iterative algorithm. The
    // corpus-sized object is the EDGE list; ranks are one row per node
    // and broadcast into each round's edge join. ----
    QuerySpec(
      "q141_pagerank_trade_graph",
      Some(s"""
        WITH RECURSIVE
        edges AS (
          SELECT s_nationkey AS src, c_nationkey AS dst, COUNT(*) AS w
          FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN customer ON o_custkey = c_custkey
          GROUP BY src, dst),
        outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
        eshare AS (
          SELECT src, dst, w * 1000000 // ow AS s
          FROM edges JOIN outw USING (src)
          UNION ALL
          SELECT n_nationkey, n_nationkey, 0 FROM nation),
        pr AS (
          SELECT 0 AS it, n_nationkey AS node, ${prScale} // COUNT(*) OVER () AS r
          FROM nation
          UNION ALL
          SELECT it + 1, e.dst,
                 ${prScale * 15 / 100} // 25 + 85 * SUM(pr.r * e.s // 1000000) // 100
          FROM pr JOIN eshare e ON e.src = pr.node
          WHERE it < $prIters GROUP BY it, e.dst)
        SELECT node AS n_nationkey, r AS rank_fp
        FROM pr WHERE it = $prIters"""),
      (s, dir) => {
        val edges = Tables.load(s, dir, "lineitem")
          .join(Tables.load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("s_nationkey").cast("long").as("src"),
            col("c_nationkey").cast("long").as("dst"))
          .agg(count(lit(1)).as("w"))
        val nodes = Tables.load(s, dir, "nation")
          .select(col("n_nationkey").cast("long").as("node"))
        graft.operators.Graph.pageRankFixedPoint(edges, nodes, prIters, prScale)
          .select(col("node").as("n_nationkey"), col("r").as("rank_fp"))
      }),

    // ---- q161: PageRank TO CONVERGENCE — q141's fixed-K topology with
    // the tolerance-mode early stop proven end to end (not just in
    // GraphSpec): toleranceL1 = 0 halts at the exact integer fixpoint
    // (measured: round 51 at sf0.01), after which further rounds
    // provably change nothing, so the result hash-matches the oracle's
    // full K=60 replay REGARDLESS of where (or whether) the stop fires
    // — the gate can't be faked by a lucky iteration count. Production
    // meaning: K stops being a magic constant; the cluster runs only
    // the rounds the graph actually needs, each round still one
    // edge-grain shuffle with node-sized broadcast ranks. ----
    QuerySpec(
      "q161_pagerank_converged",
      Some(s"""
        WITH RECURSIVE
        edges AS (
          SELECT s_nationkey AS src, c_nationkey AS dst, COUNT(*) AS w
          FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN customer ON o_custkey = c_custkey
          GROUP BY src, dst),
        outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
        eshare AS (
          SELECT src, dst, w * 1000000 // ow AS s
          FROM edges JOIN outw USING (src)
          UNION ALL
          SELECT n_nationkey, n_nationkey, 0 FROM nation),
        pr AS (
          SELECT 0 AS it, n_nationkey AS node, ${prScale} // COUNT(*) OVER () AS r
          FROM nation
          UNION ALL
          SELECT it + 1, e.dst,
                 ${prScale * 15 / 100} // 25 + 85 * SUM(pr.r * e.s // 1000000) // 100
          FROM pr JOIN eshare e ON e.src = pr.node
          WHERE it < 60 GROUP BY it, e.dst)
        SELECT node AS n_nationkey, r AS rank_fp
        FROM pr WHERE it = 60"""),
      (s, dir) => {
        val edges = Tables.load(s, dir, "lineitem")
          .join(Tables.load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("s_nationkey").cast("long").as("src"),
            col("c_nationkey").cast("long").as("dst"))
          .agg(count(lit(1)).as("w"))
        val nodes = Tables.load(s, dir, "nation")
          .select(col("n_nationkey").cast("long").as("node"))
        graft.operators.Graph.pageRankFixedPoint(edges, nodes,
            iterations = 60, scale = prScale, toleranceL1 = 0L,
            deltaEvery = 8)
          .select(col("node").as("n_nationkey"), col("r").as("rank_fp"))
      }),

    // ---- q189: HITS hubs & authorities (fixed point) over the same
    // trade graph — the other classic link-analysis prior: exporters
    // (hubs) vs importers (authorities), two scores PageRank's single
    // number conflates. All int64: edge weights quantized to GLOBAL
    // millionth shares (the any-scale overflow guard), per-round L1
    // renormalization as `v·scale div Σv`. The oracle UNROLLS the K=8
    // rounds as chained CTEs — mid-round renormalization needs an
    // aggregate-of-aggregate a recursive CTE can't express, and
    // unrolling keeps every floor placement replayable, so this
    // iterative algorithm too gates on a hash match. Each half-round
    // is one edge-keyed join + grouped sum; scores are node-sized
    // broadcasts (q141 discipline). ----
    QuerySpec(
      "q189_hits_trade_graph",
      Some {
        val k = 8
        val rounds = (1 to k).map { i =>
          val prev = if (i == 1) "h0" else s"h${i - 1}"
          s"""
        a${i}raw AS MATERIALIZED (
          SELECT e.dst AS node, CAST(SUM(e.s * p.v // 1000000) AS BIGINT) AS v
          FROM es e JOIN $prev p ON p.node = e.src GROUP BY 1),
        a$i AS MATERIALIZED (
          SELECT node, CAST(v * $prScale // GREATEST(t, 1) AS BIGINT) AS v
          FROM a${i}raw CROSS JOIN (SELECT CAST(SUM(v) AS BIGINT) AS t FROM a${i}raw)),
        h${i}raw AS MATERIALIZED (
          SELECT e.src AS node, CAST(SUM(e.s * p.v // 1000000) AS BIGINT) AS v
          FROM es e JOIN a$i p ON p.node = e.dst GROUP BY 1),
        h$i AS MATERIALIZED (
          SELECT node, CAST(v * $prScale // GREATEST(t, 1) AS BIGINT) AS v
          FROM h${i}raw CROSS JOIN (SELECT CAST(SUM(v) AS BIGINT) AS t FROM h${i}raw))"""
        }.mkString(",")
        s"""
        WITH edges AS MATERIALIZED (
          SELECT s_nationkey AS src, c_nationkey AS dst, COUNT(*) AS w
          FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN customer ON o_custkey = c_custkey
          GROUP BY src, dst),
        tot AS (SELECT CAST(SUM(w) AS BIGINT) AS wt FROM edges),
        es AS MATERIALIZED (
          SELECT src, dst, CAST(w * 1000000 // wt AS BIGINT) AS s
          FROM edges CROSS JOIN tot
          UNION ALL
          SELECT n_nationkey, n_nationkey, 0 FROM nation),
        h0 AS MATERIALIZED (SELECT n_nationkey AS node, $prScale AS v FROM nation),$rounds
        SELECT h.node AS n_nationkey, h.v AS hub_fp, a.v AS auth_fp
        FROM h$k h JOIN a$k a ON a.node = h.node"""
      },
      (s, dir) => {
        val edges = Tables.load(s, dir, "lineitem")
          .join(Tables.load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("s_nationkey").cast("long").as("src"),
            col("c_nationkey").cast("long").as("dst"))
          .agg(count(lit(1)).as("w"))
        val nodes = Tables.load(s, dir, "nation")
          .select(col("n_nationkey").cast("long").as("node"))
        graft.operators.Graph.hitsFixedPoint(edges, nodes,
            iterations = 8, scale = prScale)
          .select(col("node").as("n_nationkey"), col("hub_fp"), col("auth_fp"))
      }),

    // ---- q142: bigram frequency ranking per language — the n-gram LM
    // statistic behind corpus similarity scoring and quality priors.
    // Raw (non-distinct) bigram counts, top 10 per language with ties
    // kept by rank() and broken-for-order by the bigram string. The
    // window partitions by lang over the ALREADY-AGGREGATED count
    // table (|langs|·|vocab|² rows at most), never the corpus. ----
    QuerySpec(
      "q142_top_bigrams_per_lang",
      Some(s"""
        WITH toks AS (SELECT lang, $tokensSql AS t FROM documents),
        bg AS (
          SELECT lang, unnest(${shinglesSql(2)}) AS bigram FROM toks),
        cnt AS (
          SELECT lang, bigram, COUNT(*) AS n FROM bg GROUP BY lang, bigram)
        SELECT lang, bigram, n, rk FROM (
          SELECT lang, bigram, n,
                 rank() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rk
          FROM cnt) r
        WHERE rk <= 10"""),
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("n").desc, col("bigram"))
        Tables.load(s, dir, "documents")
          .select(col("lang"),
            explode(graft.functions.TextFunctions.shingles(col("text"), 2)).as("bigram"))
          .groupBy(col("lang"), col("bigram"))
          .agg(count(lit(1)).as("n"))
          .withColumn("rk", rank().over(w))
          .filter(col("rk") <= 10)
      }),

    // ---- q143: funnel conversion (signup → first purchase after it) —
    // the product-analytics staple. Phase 1 is a per-user window MIN
    // (signup instant); phase 2 keeps purchases at-or-after it and
    // takes the per-user first. Both the window and the aggregate
    // partition by user_id, so at 100 TB the sort is bounded by one
    // user's history and the corpus shuffles once (the window's
    // exchange is reused by the aggregate — same key). Delays in
    // integer µs; per-band medians on int64 via the q94-proven
    // percentile path. ----
    QuerySpec(
      "q143_funnel_conversion",
      Some(s"""
        WITH e AS (
          SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        su AS (
          SELECT user_id, event_type, us,
                 MIN(CASE WHEN event_type = 'signup' THEN us END)
                   OVER (PARTITION BY user_id) AS signup_us
          FROM e),
        conv AS (
          SELECT user_id, MIN(signup_us) AS signup_us,
                 MIN(CASE WHEN event_type = 'purchase' AND us >= signup_us
                          THEN us END) AS first_purchase_us
          FROM su WHERE signup_us IS NOT NULL GROUP BY user_id)
        SELECT user_id % 10 AS band,
               COUNT(*) AS n_signed,
               CAST(SUM(CASE WHEN first_purchase_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_converted,
               CAST(FLOOR(COALESCE(QUANTILE_CONT(first_purchase_us - signup_us, 0.5), -1))
                 AS BIGINT) AS median_delay_us
        FROM conv GROUP BY band"""),
      (s, dir) => {
        Tables.load(s, dir, "events").createOrReplaceTempView("events_q143")
        s.sql("""
          WITH e AS (
            SELECT user_id, event_type, unix_micros(ts) AS us FROM events_q143),
          su AS (
            SELECT user_id, event_type, us,
                   MIN(CASE WHEN event_type = 'signup' THEN us END)
                     OVER (PARTITION BY user_id) AS signup_us
            FROM e),
          conv AS (
            SELECT user_id, MIN(signup_us) AS signup_us,
                   MIN(CASE WHEN event_type = 'purchase' AND us >= signup_us
                            THEN us END) AS first_purchase_us
            FROM su WHERE signup_us IS NOT NULL GROUP BY user_id)
          SELECT user_id % 10 AS band,
                 COUNT(*) AS n_signed,
                 SUM(CASE WHEN first_purchase_us IS NOT NULL THEN 1 ELSE 0 END)
                   AS n_converted,
                 CAST(FLOOR(COALESCE(percentile_cont(0.5) WITHIN GROUP
                   (ORDER BY first_purchase_us - signup_us), -1)) AS BIGINT)
                   AS median_delay_us
          FROM conv GROUP BY band""")
      }),

    // ---- q144: characteristic terms per document — the exact-integer
    // TF-IDF surrogate: rank a document's terms by (tf DESC, df ASC,
    // term ASC) and keep the top 3. Same ORDER as tf·log(N/df) wherever
    // tf dominates, but with NO floats anywhere, so the gate is a hash
    // match. Two shuffles ((doc,term) count; df per term) + a join at
    // the term grain and a per-doc window over the tf table — the
    // heaviest object moved is the (doc,term) pair list, never raw
    // text. ----
    QuerySpec(
      "q144_characteristic_terms",
      Some(s"""
        WITH toks AS (
          -- the length guard mirrors Spark tokens(): empty/blank text
          -- yields NO tokens, where bare string_split would yield ['']
          SELECT doc_id, unnest($tokensSql) AS term FROM documents
          WHERE len(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) > 0),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
        df AS (
          SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
        SELECT doc_id, term, tf, df, rk FROM (
          SELECT tf.doc_id, tf.term, tf.tf, df.df,
                 rank() OVER (PARTITION BY tf.doc_id
                              ORDER BY tf.tf DESC, df.df ASC, tf.term) AS rk
          FROM tf JOIN df USING (term)) r
        WHERE rk <= 3"""),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val tf = docs
          .select(col("doc_id"),
            explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))
          .orderBy(col("tf").desc, col("df").asc, col("term"))
        tf.join(df_, "term")
          .withColumn("rk", rank().over(w))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rk"))
      }),

    // ---- q145: model-based quality filter (CCNet/FineWeb's fastText
    // classifier step as dataflow) — integer per-term weights derived
    // from a labeled seed partition (here: doc_id % 7 = 0 plays the
    // curated reference corpus), documents scored Σ tf·w and kept when
    // positive. Weights are vocabulary-grain (bounded ≪ corpus); the
    // corpus moves only as (doc, term, tf) triples. ----
    QuerySpec(
      "q145_quality_classifier",
      Some(s"""
        WITH toks AS (
          SELECT doc_id, doc_id % 7 = 0 AS pos, unnest($tokensSql) AS term
          FROM documents
          WHERE len(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) > 0),
        tf AS (
          SELECT doc_id, pos, term, COUNT(*) AS tf
          FROM toks GROUP BY doc_id, pos, term),
        w AS (
          SELECT term,
                 1000 * SUM(CASE WHEN pos THEN 1 ELSE 0 END)
                   // (COUNT(*) + 1) - 500 AS w
          FROM tf GROUP BY term)
        SELECT tf.doc_id, CAST(SUM(tf.tf * w.w) AS BIGINT) AS score,
               CAST(CASE WHEN SUM(tf.tf * w.w) > 0 THEN 1 ELSE 0 END AS BIGINT) AS kept
        FROM tf JOIN w USING (term)
        GROUP BY tf.doc_id"""),
      (s, dir) =>
        graft.operators.CorpusPrep.classifierScore(
          Tables.load(s, dir, "documents")
            .withColumn("_seed", col("doc_id") % 7 === 0),
          "doc_id", "text", "_seed")),

    // ---- q146: gaps-and-islands run compression — collapse each
    // user's consecutive same-type events into one row per run (the
    // SCD-2 validity-interval construction, session labeling, state-
    // machine compaction primitive). LAG marks run starts, a running
    // sum numbers runs, one aggregate per (user, run) collapses — all
    // three partition by user_id, so the window sort is bounded by one
    // user's history and the aggregate reuses the window's exchange.
    // event_id tiebreak makes runs deterministic under equal ts. ----
    QuerySpec(
      "q146_event_runs",
      Some("""
        WITH e AS (
          SELECT user_id, event_type, epoch_us(ts) AS us, event_id
          FROM events),
        marked AS (
          SELECT user_id, event_type, us, event_id,
                 CASE WHEN lag(event_type) OVER
                        (PARTITION BY user_id ORDER BY us, event_id)
                      = event_type THEN 0 ELSE 1 END AS chg
          FROM e),
        runs AS (
          SELECT user_id, event_type, us,
                 SUM(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_seq
          FROM marked)
        SELECT user_id, CAST(run_seq AS BIGINT) AS run_seq, event_type,
               CAST(MIN(us) AS BIGINT) AS start_us,
               CAST(MAX(us) AS BIGINT) AS end_us,
               COUNT(*) AS n_events
        FROM runs GROUP BY user_id, run_seq, event_type"""),
      (s, dir) => {
        val ord = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val run = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"), col("event_id"))
          .withColumn("chg",
            when(lag(col("event_type"), 1).over(ord) === col("event_type"), 0L)
              .otherwise(1L))
          .withColumn("run_seq", sum(col("chg")).over(run))
          .groupBy(col("user_id"), col("run_seq"), col("event_type"))
          .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
            count(lit(1)).as("n_events"))
      }),

    // ---- q147: incremental rollup maintenance — the engine folds a
    // delta partial into a pre-existing additive state
    // (merge(partial(old), partial(new)), Rollup operator) while the
    // oracle aggregates the FULL table from scratch; the hash gate
    // therefore proves incremental == recompute for this split. The
    // fact history is never re-read in the engine form: both partials
    // collapse map-side to the (priority, year) grain before the one
    // grain-sized merge shuffle. ----
    QuerySpec(
      "q147_incremental_rollup",
      Some(s"""
        SELECT o_orderpriority,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               COUNT(*) AS n_rows,
               CAST(SUM(${graft.Exact.centsSql("o_totalprice")}) AS BIGINT)
                 AS revenue_cents
        FROM orders GROUP BY o_orderpriority, o_year"""),
      (s, dir) => {
        val orders = Tables.load(s, dir, "orders")
          .withColumn("o_year", year(col("o_orderdate")).cast("long"))
        val keys = Seq("o_orderpriority", "o_year")
        val sums = Seq("revenue_cents" -> graft.Exact.cents(col("o_totalprice")))
        val split = col("o_orderdate") < lit("1997-01-01")
        val state = graft.operators.Rollup.partial(orders.filter(split), keys, sums)
        val delta = graft.operators.Rollup.partial(orders.filter(!split), keys, sums)
        graft.operators.Rollup.merge(state, delta, keys)
          .select(col("o_orderpriority"), col("o_year"),
            col("n_rows"), col("revenue_cents"))
      }),

    // ---- q180: PMI collocations — pointwise mutual information of
    // adjacent word pairs, the classic "new york"/"machine learning"
    // multiword-expression detector a tokenizer-vocab or phrase-mining
    // pass runs over a crawl. Contingency-consistent marginals: c_a =
    // occurrences as LEFT element, c_b = as RIGHT, T = total bigram
    // instances, pmi_fp = (log2fp(c_ab) + log2fp(T)) − (log2fp(c_a) +
    // log2fp(c_b)) in the 16-bit fixed point — the same exact log2
    // surrogate as BM25, monotone in the true PMI at fixed arguments
    // and bit-identical across engines. Support floor c_ab ≥ 5 (PMI's
    // standard rare-pair guard). Scale shape: ONE corpus shuffle to
    // bigram counts; marginals are aggregates OF the aggregate
    // (vocabulary grain) broadcast back; global top-20 is ORDER BY +
    // LIMIT (TakeOrderedAndProject), never a global window. ----
    QuerySpec(
      "q180_pmi_collocations",
      Some(s"""
        WITH toks AS (SELECT doc_id, $tokensSql AS t FROM documents),
        bg AS (
          SELECT unnest(${shinglesSql(2)}) AS bigram FROM toks),
        cnt AS (
          SELECT bigram,
                 string_split(bigram, ' ')[1] AS wa,
                 string_split(bigram, ' ')[2] AS wb,
                 COUNT(*) AS c_ab
          FROM bg WHERE contains(bigram, ' ') GROUP BY 1),
        ca AS (SELECT wa, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM cnt GROUP BY wa),
        cb AS (SELECT wb, CAST(SUM(c_ab) AS BIGINT) AS c_b FROM cnt GROUP BY wb),
        tot AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS t_tot FROM cnt)
        SELECT bigram, c_ab, c_a, c_b,
               (${log2FpSql("c_ab")} + ${log2FpSql("t_tot")})
             - (${log2FpSql("c_a")} + ${log2FpSql("c_b")}) AS pmi_fp
        FROM cnt JOIN ca USING (wa) JOIN cb USING (wb) CROSS JOIN tot
        WHERE c_ab >= 5
        ORDER BY pmi_fp DESC, bigram LIMIT 20"""),
      (s, dir) => {
        val S = graft.operators.Search
        // bigram counts: ONE corpus shuffle; the persisted table is
        // vocabulary²-grain (three consumers: marginals ×2 + the join)
        val cnt = Tables.load(s, dir, "documents")
          .select(explode(
            graft.functions.TextFunctions.shingles(col("text"), 2)).as("bigram"))
          .filter(col("bigram").contains(" "))
          .groupBy("bigram").agg(count(lit(1)).as("c_ab"))
          .withColumn("wa", split(col("bigram"), " ").getItem(0))
          .withColumn("wb", split(col("bigram"), " ").getItem(1))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // populated before the marginal fan-out: three subtrees (two
        // broadcast marginals + the join) reference the cache in one
        // action, and an unpopulated persist lets them race and re-run
        // the corpus tokenize+shuffle per reference
        cnt.count()
        val ca = cnt.groupBy("wa").agg(sum("c_ab").as("c_a"))
        val cb = cnt.groupBy("wb").agg(sum("c_ab").as("c_b"))
        val tot = cnt.agg(sum("c_ab").as("t_tot"))
        // marginals are vocabulary-grain — broadcast back into the
        // bigram table (≪ corpus at any scale); T is the q20 1-row
        cnt.join(broadcast(ca), "wa").join(broadcast(cb), "wb")
          .crossJoin(broadcast(tot))
          .filter(col("c_ab") >= 5)
          .selectExpr("bigram", "c_ab", "c_a", "c_b",
            s"""((${S.log2FpExpr("c_ab")} + ${S.log2FpExpr("t_tot")})
               - (${S.log2FpExpr("c_a")} + ${S.log2FpExpr("c_b")})) AS pmi_fp""")
          .orderBy(col("pmi_fp").desc, col("bigram"))
          .limit(20)
      })
  )
}
