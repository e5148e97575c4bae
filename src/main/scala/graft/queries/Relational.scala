package graft.queries

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query catalog — the reference's analytical surface
  * (Tasks 4–11 of `BatchProcessingFinal.ipynb`, see SURVEY.md §2.4–§2.7)
  * re-expressed over the synthetic star schema.
  *
  * Shapes covered, with the reference operator IDs from SURVEY.md §2:
  *   - groupBy+count / sum aggregations (A1–A5) — q01, q02, q04, q16
  *   - inner equi-joins, 2-way and 3-way chains (J1–J4) — q02, q05
  *   - RANK() top-1-per-group + DISTINCT (W1–W3, A8) — q03, q05, q07
  *   - global top-1 via ORDER BY ... LIMIT 1 (A6, O3) — q06
  *   - median-by-group (A7/W4; exact percentile here, approx variant
  *     asserted equal in tests) — q08, q10, q11
  *   - CASE-based banding (F4) — q07, q08, q11
  *   - EXTRACT(YEAR)/BETWEEN predicates (F9, F13, P10) — q04, q09
  *   - running-sum window frame (W5) — q18
  *   - ROW_NUMBER change-data dedup (keep-latest) — q19
  *   - semi/anti joins (beyond the reference's surface) — q14, q15
  *
  * All money/double aggregations run over integer cents (exact, engine-
  * order-independent); see [[graft.QuerySpec]] determinism rules.
  */
object Relational {

  // exact-cents convention: single source of truth in graft.Exact
  private def cents(c: Column): Column = graft.Exact.cents(c)
  private def centsSql(e: String): String = graft.Exact.centsSql(e)

  /** Shared by q50 and its bucketed skew variant q52 — the bucketed form
    * must produce bit-identical sessions. */
  private val sessionizeOracleSql = """
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS us FROM events
    ), gaps AS (
      SELECT user_id, event_id, us,
             CASE WHEN LAG(us) OVER w IS NULL
                   OR us - LAG(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), sessions AS (
      SELECT user_id, event_id, us,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_seq
      FROM gaps
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events,
           MIN(event_id) AS first_event_id,
           CAST((MAX(us) - MIN(us)) AS BIGINT) AS duration_us
    FROM sessions
    GROUP BY user_id, session_seq"""

  /** Shared by q51 and its bucketed skew variant q53 (DuckDB has a
    * native ASOF JOIN; the Spark side composes union+window forms —
    * see operators.AsofJoin). */
  private val asofOracleSql = """
    WITH p AS (
      SELECT user_id, event_id, epoch_us(ts) AS us
      FROM events WHERE event_type = 'purchase'
    ), s0 AS (
      SELECT user_id, epoch_us(ts) AS us, event_id FROM events
      WHERE event_type = 'signup'
    ), s AS (
      SELECT user_id, us, MAX(event_id) AS signup_event_id
      FROM s0 GROUP BY user_id, us
    )
    SELECT p.user_id, p.event_id, p.us, s.signup_event_id AS asof_signup_event_id
    FROM p ASOF LEFT JOIN s
      ON p.user_id = s.user_id AND s.us <= p.us"""

  /** Purchases (left) and per-(user, time) deduped signups (right) for
    * the as-of catalog entries. */
  private def asofInputs(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val events = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "us")
    val signups = events.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("us"))
      .agg(max(col("event_id")).as("signup_event_id"))
    (purchases, signups)
  }

  /** Account-balance banding — the reference's 4-bucket CASE age banding
    * (`BatchProcessingFinal.ipynb:5947-5954`) over c_acctbal. */
  private def acctBand(c: Column): Column =
    when(c < 0, "negative")
      .when(c < 3000, "low")
      .when(c < 7000, "mid")
      .otherwise("high")

  private val acctBandSql =
    """CASE WHEN c_acctbal < 0 THEN 'negative'
      |     WHEN c_acctbal < 3000 THEN 'low'
      |     WHEN c_acctbal < 7000 THEN 'mid'
      |     ELSE 'high' END""".stripMargin

  val specs: Seq[QuerySpec] = Seq(

    // ---- q01: pricing summary (TPC-H Q1 shape; A1/A2, O2, pushdown) ----
    QuerySpec(
      "q01_pricing_summary",
      Some(s"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(${centsSql("l_quantity")}) AS BIGINT) AS sum_qty_cents,
               CAST(SUM(${centsSql("l_extendedprice")}) AS BIGINT) AS sum_price_cents,
               CAST(SUM(${centsSql("l_extendedprice*(1-l_discount)")}) AS BIGINT) AS sum_disc_cents,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
        GROUP BY l_returnflag, l_linestatus"""),
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        li.filter(col("l_shipdate") <= lit("2000-12-31 00:00:00").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(cents(col("l_quantity"))).as("sum_qty_cents"),
            sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
            sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_cents"),
            count(lit(1)).as("count_order"))
      }),

    // ---- q02: Task-4 CTE shape — 3-way join + group count (J1/J2, A2) ----
    QuerySpec(
      "q02_orders_by_nation_priority",
      Some("""
        SELECT n_name, o_orderpriority, COUNT(*) AS order_count
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, o_orderpriority"""),
      (s, dir) => {
        val orders = Tables.load(s, dir, "orders")
        val customer = Tables.load(s, dir, "customer")
        val nation = Tables.load(s, dir, "nation")
        // nation is constant-size (25 rows) — hinted. customer GROWS
        // with SF (TPC-H 150k/SF): the hint is left to stats/AQE, which
        // broadcast it at any scale where it fits (PlanSpec asserts the
        // BHJ at bench scale) and degrade to a shuffle join where it
        // doesn't — a static hint would OOM the driver at 100 TB
        // (r15 forced-broadcast audit, q201 discipline).
        orders
          .join(customer, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
      }),

    // ---- q03: Task 4 — top priority per nation: RANK()=1 + DISTINCT ----
    QuerySpec(
      "q03_top_priority_per_nation",
      Some("""
        WITH counts AS (
          SELECT n_name, o_orderpriority, COUNT(*) AS order_count
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name, o_orderpriority
        ), ranked AS (
          SELECT *, RANK() OVER (PARTITION BY n_name ORDER BY order_count DESC) AS cat_rank
          FROM counts
        )
        SELECT DISTINCT n_name, o_orderpriority, order_count
        FROM ranked WHERE cat_rank = 1"""),
      (s, dir) => {
        val orders = Tables.load(s, dir, "orders")
        val customer = Tables.load(s, dir, "customer")
        val nation = Tables.load(s, dir, "nation")
        // customer unhinted (linear in SF — q02 rationale); nation kept
        val counts = orders
          .join(customer, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
        val w = Window.partitionBy(col("n_name")).orderBy(col("order_count").desc)
        counts
          .withColumn("cat_rank", rank().over(w))
          .filter(col("cat_rank") === 1)
          .select("n_name", "o_orderpriority", "order_count")
          .distinct()
      }),

    // ---- q04: Task 5 — posts per year, YEAR BETWEEN filter (F9/F13/P10) ----
    QuerySpec(
      "q04_orders_per_year_status",
      Some("""
        SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS order_year, o_orderstatus,
               COUNT(*) AS order_count
        FROM orders
        WHERE YEAR(o_orderdate) BETWEEN 1996 AND 1999
        GROUP BY 1, 2"""),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .filter(year(col("o_orderdate")).between(1996, 1999))
          .groupBy(
            year(col("o_orderdate")).cast("long").as("order_year"),
            col("o_orderstatus"))
          .agg(count(lit(1)).as("order_count"))),

    // ---- q05: Task 6.1 — top customer per nation via 3-way chain + RANK ----
    QuerySpec(
      "q05_top_customer_per_nation",
      Some(s"""
        WITH joined AS (
          SELECT r_name, n_name, c_name, ${centsSql("c_acctbal")} AS acctbal_cents
          FROM customer
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        ), ranked AS (
          SELECT *, RANK() OVER (PARTITION BY n_name ORDER BY acctbal_cents DESC) AS rank_order
          FROM joined
        )
        SELECT DISTINCT r_name, n_name, c_name, acctbal_cents
        FROM ranked WHERE rank_order = 1"""),
      (s, dir) => {
        val customer = Tables.load(s, dir, "customer")
        val nation = Tables.load(s, dir, "nation")
        val region = Tables.load(s, dir, "region")
        val joined = customer
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .select(
            col("r_name"), col("n_name"), col("c_name"),
            cents(col("c_acctbal")).as("acctbal_cents"))
        val w = Window.partitionBy(col("n_name")).orderBy(col("acctbal_cents").desc)
        joined
          .withColumn("rank_order", rank().over(w))
          .filter(col("rank_order") === 1)
          .select("r_name", "n_name", "c_name", "acctbal_cents")
          .distinct()
      }),

    // ---- q06: Task 6.2 — global top-1 (TakeOrderedAndProject; A6/O3).
    // Deterministic tiebreak on c_name (SURVEY §7.4: the reference's own
    // LIMIT 1 under a tie is order-dependent — we pin it). ----
    QuerySpec(
      "q06_top_customer_global",
      Some(s"""
        SELECT c_name, ${centsSql("c_acctbal")} AS acctbal_cents
        FROM customer
        ORDER BY acctbal_cents DESC, c_name
        LIMIT 1"""),
      (s, dir) =>
        Tables.load(s, dir, "customer")
          .select(col("c_name"), cents(col("c_acctbal")).as("acctbal_cents"))
          .orderBy(col("acctbal_cents").desc, col("c_name"))
          .limit(1)),

    // ---- q07: Task 7 — top segment per balance band (F4 + W3) ----
    QuerySpec(
      "q07_top_segment_per_band",
      Some(s"""
        WITH banded AS (
          SELECT $acctBandSql AS band, c_mktsegment,
                 COUNT(*) AS segment_count
          FROM customer
          GROUP BY 1, 2
        ), ranked AS (
          SELECT *, RANK() OVER (PARTITION BY band ORDER BY segment_count DESC) AS rnk
          FROM banded
        )
        SELECT DISTINCT band, c_mktsegment, segment_count
        FROM ranked WHERE rnk = 1"""),
      (s, dir) => {
        val banded = Tables.load(s, dir, "customer")
          .groupBy(acctBand(col("c_acctbal")).as("band"), col("c_mktsegment"))
          .agg(count(lit(1)).as("segment_count"))
        val w = Window.partitionBy(col("band")).orderBy(col("segment_count").desc)
        banded
          .withColumn("rnk", rank().over(w))
          .filter(col("rnk") === 1)
          .select("band", "c_mktsegment", "segment_count")
          .distinct()
      }),

    // ---- q08: Task 8 — median per band (A7; exact percentile over ints,
    // which both engines interpolate identically) ----
    QuerySpec(
      "q08_median_acctbal_by_band",
      Some(s"""
        SELECT $acctBandSql AS band,
               QUANTILE_CONT(${centsSql("c_acctbal")}, 0.5) AS median_cents,
               COUNT(*) AS n
        FROM customer
        GROUP BY 1"""),
      (s, dir) =>
        Tables.load(s, dir, "customer")
          .groupBy(acctBand(col("c_acctbal")).as("band"))
          .agg(
            expr("percentile(CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT), 0.5)").as("median_cents"),
            count(lit(1)).as("n"))),

    // ---- q09: Task 9 — signups per month (F9 on event-time) ----
    QuerySpec(
      "q09_signups_per_month",
      Some("""
        SELECT CAST(MONTH(ts) AS BIGINT) AS month, COUNT(*) AS signup_count
        FROM events
        WHERE event_type = 'signup'
        GROUP BY 1"""),
      (s, dir) =>
        Tables.load(s, dir, "events")
          .filter(col("event_type") === "signup")
          .groupBy(month(col("ts")).cast("long").as("month"))
          .agg(count(lit(1)).as("signup_count"))),

    // ---- q10: Task 10 — median event value per type ----
    QuerySpec(
      "q10_median_value_by_type",
      Some(s"""
        SELECT event_type,
               QUANTILE_CONT(${centsSql("value")}, 0.5) AS median_value_cents
        FROM events
        GROUP BY event_type"""),
      (s, dir) =>
        Tables.load(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(expr("percentile(CAST(FLOOR(value*100 + 0.5) AS BIGINT), 0.5)")
            .as("median_value_cents"))),

    // ---- q11: Task 11 — median per (month, type): two-key grouping ----
    QuerySpec(
      "q11_median_value_by_month_type",
      Some(s"""
        SELECT CAST(MONTH(ts) AS BIGINT) AS month, event_type,
               QUANTILE_CONT(${centsSql("value")}, 0.5) AS median_value_cents
        FROM events
        WHERE MONTH(ts) BETWEEN 1 AND 6
        GROUP BY 1, 2"""),
      (s, dir) =>
        Tables.load(s, dir, "events")
          .filter(month(col("ts")).between(1, 6))
          .groupBy(month(col("ts")).cast("long").as("month"), col("event_type"))
          .agg(expr("percentile(CAST(FLOOR(value*100 + 0.5) AS BIGINT), 0.5)")
            .as("median_value_cents"))),

    // ---- q16: A1 value-frequency profiling ----
    QuerySpec(
      "q16_value_frequency_profile",
      Some("""
        SELECT lang, source, COUNT(*) AS n
        FROM documents GROUP BY lang, source"""),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n"))),

    // ---- q17: A9 distinct/cardinality profiling ----
    QuerySpec(
      "q17_distinct_profile",
      Some("""
        SELECT COUNT(*) AS n_rows,
               COUNT(DISTINCT event_type) AS n_types,
               COUNT(DISTINCT user_id) AS n_users
        FROM events"""),
      (s, dir) =>
        Tables.load(s, dir, "events")
          .agg(
            count(lit(1)).as("n_rows"),
            countDistinct(col("event_type")).as("n_types"),
            countDistinct(col("user_id")).as("n_users"))),

    // ---- q18: W5 running-sum frame (UNBOUNDED PRECEDING..CURRENT ROW) ----
    QuerySpec(
      "q18_running_value_per_user",
      Some(s"""
        SELECT event_id, user_id,
               CAST(SUM(${centsSql("value")}) OVER (
                 PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS running_cents
        FROM events
        WHERE user_id < 50"""),
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.load(s, dir, "events")
          .filter(col("user_id") < 50)
          .select(
            col("event_id"), col("user_id"),
            sum(cents(col("value"))).over(w).as("running_cents"))
      }),

    // ---- q19: keep-latest dedup by key via ROW_NUMBER ----
    QuerySpec(
      "q19_dedup_keep_latest",
      Some("""
        WITH numbered AS (
          SELECT user_id, event_type, event_id,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                    ORDER BY event_id DESC) AS rn
          FROM events
        )
        SELECT user_id, event_type, event_id AS latest_event_id
        FROM numbered WHERE rn = 1"""),
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("event_id").desc)
        Tables.load(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"), col("event_id").as("latest_event_id"))
      }),

    // ---- q27: O4 — ORDER BY ... NULLS LAST (commented-only in the
    // reference, BatchProcessingFinal.ipynb:1556-1558). LIMIT makes the
    // ordering semantics observable in the content; doc_id tiebreak
    // keeps the cut deterministic. ----
    QuerySpec(
      "q27_order_nulls_last",
      Some("""
        SELECT doc_id, NULLIF(TRIM(lang), '') AS lang_n
        FROM documents
        ORDER BY lang_n ASC NULLS LAST, doc_id
        LIMIT 50"""),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            when(trim(col("lang")) === "", lit(null))
              .otherwise(trim(col("lang"))).as("lang_n"))
          .orderBy(col("lang_n").asc_nulls_last, col("doc_id"))
          .limit(50)),

    // ---- q12: ROLLUP — subtotal hierarchy (beyond the reference) ----
    QuerySpec(
      "q12_rollup_year_status",
      Some(s"""
        SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS order_year, o_orderstatus,
               COUNT(*) AS n,
               CAST(SUM(${centsSql("o_totalprice")}) AS BIGINT) AS total_cents
        FROM orders
        GROUP BY ROLLUP(CAST(YEAR(o_orderdate) AS BIGINT), o_orderstatus)"""),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .rollup(year(col("o_orderdate")).cast("long").as("order_year"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(cents(col("o_totalprice"))).as("total_cents"))),

    // ---- q13: CUBE — full cross-tab margins ----
    QuerySpec(
      "q13_cube_priority_status",
      Some("""
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        FROM orders
        GROUP BY CUBE(o_orderpriority, o_orderstatus)"""),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .cube(col("o_orderpriority"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"))),

    // ---- q50: sessionization — 30-min inactivity gap sessions via
    // LAG + running sum (both engines compute on epoch MICROSECONDS so
    // the parquet ns-vs-µs precision difference can't change ordering
    // or gap math) ----
    QuerySpec(
      "q50_sessionize_events",
      Some(sessionizeOracleSql),
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        graft.operators.Sessionize.sessionize(e, "user_id", "event_id", "us", 1800000000L)
      }),

    // ---- q52: the hot-key (two-phase bucketed) sessionize variant —
    // same oracle as q50: bucketing must not change the result ----
    QuerySpec(
      "q52_sessionize_bucketed_skew",
      Some(sessionizeOracleSql),
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        graft.operators.Sessionize.sessionizeBucketed(
          e, "user_id", "event_id", "us", gapUs = 1800000000L, bucketUs = 3600000000L)
      }),

    // ---- q51: as-of join — latest signup at-or-before each purchase
    // (DuckDB has a native ASOF JOIN; the Spark side composes the
    // union+window form — see operators.AsofJoin) ----
    QuerySpec(
      "q51_asof_purchase_signup",
      Some(asofOracleSql),
      (s, dir) => {
        val (purchases, signups) = asofInputs(s, dir)
        graft.operators.AsofJoin.asofBackward(
          purchases, signups, "user_id", "us", Seq("signup_event_id"))
      }),

    // ---- q53: the hot-key (two-phase bucketed) as-of variant — same
    // oracle as q51: backward-match decomposes exactly by time bucket ----
    QuerySpec(
      "q53_asof_bucketed_skew",
      Some(asofOracleSql),
      (s, dir) => {
        val (purchases, signups) = asofInputs(s, dir)
        graft.operators.AsofJoin.asofBackwardBucketed(
          purchases, signups, "user_id", "us", Seq("signup_event_id"),
          bucket = 86400000000L) // 1-day buckets
      }),

    // ---- q14: anti join — customers with no recent urgent order (NOT
    // EXISTS over a filtered subquery). r7's bare "no orders at all"
    // form was vacuously green: the generator gives every customer an
    // order, so the anti-join never produced a row at the gate scale.
    // The filtered form keeps the identical anti-join topology (filter
    // pushed below the join's build side) and returns 367/1500
    // customers at sf0.01 — the hash gate now checks real output. ----
    QuerySpec(
      "q14_customers_without_orders",
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderpriority = '1-URGENT'
            AND YEAR(o_orderdate) >= 1997)"""),
      (s, dir) => {
        val customer = Tables.load(s, dir, "customer")
        val orders = Tables.load(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT" &&
            year(col("o_orderdate")) >= 1997)
        customer
          .join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
      }),

    // ---- q15: semi join — suppliers with any lineitem (EXISTS) ----
    QuerySpec(
      "q15_suppliers_with_sales",
      Some("""
        SELECT s_suppkey, s_name FROM supplier
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)"""),
      (s, dir) => {
        val supplier = Tables.load(s, dir, "supplier")
        val lineitem = Tables.load(s, dir, "lineitem")
        supplier
          .join(lineitem, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select("s_suppkey", "s_name")
      })
  )
}
