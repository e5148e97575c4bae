package graft.queries

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining classic warehouse shapes (TPC-H Q2/Q4/Q6/Q9/Q11/Q12/Q13/
  * Q14/Q15/Q19 analogues over the driver's schema — no partsupp /
  * shipmode / commitdate columns exist, so each shape is re-anchored on
  * the columns that do). These complete the relational surface beyond
  * the reference's own queries (SURVEY §2.4–2.7): semi-join EXISTS with
  * a correlated date bound, pure scan-aggregate with every predicate
  * pushed, outer-join histograms, conditional-aggregate shares,
  * equals-max and min-per-group join-backs, disjunctive predicate
  * pushdown, and a 5-way star join.
  *
  * Determinism rules as in [[graft.QuerySpec]] — money through integer
  * cents, explicit tiebreaks, integer division (Spark `div` == DuckDB
  * `//` on non-negative values) for any ratio.
  */
object Warehouse {

  private val cents = "CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)"

  val specs: Seq[QuerySpec] = Seq(

    // ---- q107: pure scan-aggregate (TPC-H Q6) — the canonical
    // predicate-pushdown showcase: every filter (two timestamp range
    // bounds, a double BETWEEN, a quantity bound) must reach the
    // parquet scan; the plan is Scan→Filter→partial agg→single
    // exchange of one row. At 100 TB this is the query that proves
    // the engine reads only row groups whose min/max straddle 1996. ----
    QuerySpec(
      "q107_forecast_revenue",
      Some("""
        SELECT CAST(SUM(CAST(FLOOR(l_extendedprice*l_discount*100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS discount_cents,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24"""),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(
            sum(floor(col("l_extendedprice") * col("l_discount") * 100 + 0.5)
              .cast("long")).as("discount_cents"),
            count(lit(1)).as("n_items"))),

    // ---- q108: EXISTS semi-join with a correlated date bound (TPC-H
    // Q4 shape; no l_commitdate column, so "late" = shipped >60 days
    // after the order). The engine form is an explicit left-semi join
    // — the plan Catalyst reaches after decorrelating EXISTS — with
    // the inequality as a residual on the orderkey equi-join. ----
    QuerySpec(
      "q108_late_shipment_priority",
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-07-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority"""),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
          .join(Tables.load(s, dir, "lineitem"),
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"))),

    // ---- q109: outer-join histogram (TPC-H Q13) — customers bucketed
    // by how many orders they placed, INCLUDING the zero bucket the
    // inner join would silently drop. Two aggregations ride one
    // exchange each; the second group-by is tiny (≤ max order count). ----
    QuerySpec(
      "q109_customer_order_distribution",
      Some("""
        SELECT n_orders, COUNT(*) AS n_customers
        FROM (SELECT c_custkey, COUNT(o_orderkey) AS n_orders
              FROM customer LEFT JOIN orders ON o_custkey = c_custkey
              GROUP BY c_custkey)
        GROUP BY n_orders"""),
      (s, dir) =>
        Tables.load(s, dir, "customer")
          .join(Tables.load(s, dir, "orders"),
            col("o_custkey") === col("c_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"))
          .groupBy(col("n_orders"))
          .agg(count(lit(1)).as("n_customers"))),

    // ---- q110: conditional-aggregate share (TPC-H Q14) — promo
    // revenue fraction for one month, emitted as numerator /
    // denominator cents plus basis points via INTEGER division
    // (Spark `div` == DuckDB `//` for non-negative operands) so no
    // float ratio is ever hashed. One fact⋈dim join; part (linear in SF)
    // is UNHINTED — stats/AQE broadcast it wherever it fits (r15
    // forced-broadcast audit discipline; PlanSpec asserts BHJ at
    // bench scale). ----
    QuerySpec(
      "q110_promo_revenue_share",
      Some(s"""
        SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $cents ELSE 0 END) AS BIGINT)
                 AS promo_cents,
               CAST(SUM($cents) AS BIGINT) AS total_cents,
               CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $cents ELSE 0 END) * 10000
                    // CAST(SUM($cents) AS BIGINT) AS BIGINT) AS share_bp
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-06-01'
          AND l_shipdate <  TIMESTAMP '1996-07-01'"""),
      (s, dir) => {
        val rev = floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .cast("long")
        Tables.load(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-06-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
          .join(Tables.load(s, dir, "part"),
            col("p_partkey") === col("l_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0L))).as("promo_cents"),
            sum(rev).as("total_cents"))
          .select(col("promo_cents"), col("total_cents"),
            expr("promo_cents * 10000 div total_cents").as("share_bp"))
      }),

    // ---- q111: equals-max join-back (TPC-H Q15) — the supplier(s)
    // whose quarterly revenue equals the global max, ties kept by
    // joining the supplier-grain aggregate against its own broadcast
    // 1-row MAX (rev_cents = max_rev). The oracle keeps the RANK()=1
    // spelling; the Spark plan deliberately avoids the global-window
    // single-reducer — partial+final agg to one row, broadcast back,
    // the supplier-grain frame never leaves its partitions. ----
    QuerySpec(
      "q111_top_revenue_supplier",
      Some(s"""
        WITH rev AS (
          SELECT l_suppkey, CAST(SUM($cents) AS BIGINT) AS rev_cents
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey),
        ranked AS (SELECT *, RANK() OVER (ORDER BY rev_cents DESC) AS rk FROM rev)
        SELECT s_suppkey, s_name, rev_cents
        FROM ranked JOIN supplier ON s_suppkey = l_suppkey
        WHERE rk = 1"""),
      (s, dir) => {
        // the explicit suppkey non-null filter (a no-op on TPC-H data —
        // the key is NOT NULL by spec) matters for the PLAN: without
        // it, only the join branch infers IsNotNull(l_suppkey) from
        // its join key, the two branches' scan subtrees canonicalize
        // differently, and AQE cannot reuse the shuffle stage — the
        // quarter scan + supplier-grain partial agg would execute
        // TWICE. With it, the final plan shows ReusedExchange: one
        // fact-table pass feeds both rev and its max.
        val rev = Tables.load(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp") &&
            col("l_suppkey").isNotNull)
          .groupBy(col("l_suppkey"))
          .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
            .cast("long")).as("rev_cents"))
        val maxRev = rev.groupBy().agg(max(col("rev_cents")).as("max_rev"))
        rev.join(broadcast(maxRev), col("rev_cents") === col("max_rev"))
          .join(Tables.load(s, dir, "supplier"),
            col("s_suppkey") === col("l_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("rev_cents"))
      }),

    // ---- q112: disjunctive predicate bands (TPC-H Q19) — an OR of
    // three (brand, size-range, quantity-range) conjunctions across
    // the join. Catalyst extracts the common l_partkey equi-key and
    // keeps the disjunction as a residual; the p_brand IN (...)
    // superset predicate is pushable to the part scan. ----
    QuerySpec(
      "q112_quantity_band_revenue",
      Some(s"""
        SELECT CAST(SUM($cents) AS BIGINT) AS revenue_cents, COUNT(*) AS n_items
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 40)"""),
      (s, dir) => {
        val band = (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
            col("l_quantity").between(20, 40))
        Tables.load(s, dir, "lineitem")
          .join(Tables.load(s, dir, "part"),
            col("p_partkey") === col("l_partkey"))
          .filter(band)
          .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
            .cast("long")).as("revenue_cents"),
            count(lit(1)).as("n_items"))
      }),

    // ---- q113: 5-way star join rollup (TPC-H Q9 shape; no partsupp
    // cost column, so "profit" is revenue on the ECONOMY part slice)
    // grouped by supplier nation × order year. lineitem⋈orders is the
    // one fact⋈fact exchange; nation (constant) is hinted,
    // part/supplier (linear in SF) are left to stats/AQE. ----
    QuerySpec(
      "q113_nation_year_revenue",
      Some(s"""
        SELECT n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM($cents) AS BIGINT) AS revenue_cents
        FROM lineitem
        JOIN part     ON p_partkey  = l_partkey
        JOIN supplier ON s_suppkey  = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        JOIN orders   ON o_orderkey = l_orderkey
        WHERE p_type = 'ECONOMY'
        GROUP BY n_name, o_year"""),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .join(Tables.load(s, dir, "part").filter(col("p_type") === "ECONOMY"),
            col("p_partkey") === col("l_partkey"))
          .join(Tables.load(s, dir, "supplier"),
            col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(Tables.load(s, dir, "nation")),
            col("n_nationkey") === col("s_nationkey"))
          .join(Tables.load(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
            .cast("long")).as("revenue_cents"))),

    // ---- q114: HAVING against a global scalar (TPC-H Q11 shape) —
    // parts whose lineitem value exceeds 1.5× the average part's
    // (relative threshold, so the predicate selects a stable slice at
    // ANY scale factor — TPC-H's own FRACTION scales the same way).
    // SQL form on both engines: the uncorrelated scalar subquery plans
    // as a separately-executed Subquery in Spark (no BNLJ), and the
    // threshold compare stays in integers (×2 vs ×3, // = div). ----
    QuerySpec(
      "q114_important_parts",
      Some("""
        WITH v AS (SELECT l_partkey,
                          CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
                            AS val_cents
                   FROM lineitem GROUP BY l_partkey)
        SELECT l_partkey, val_cents FROM v
        WHERE val_cents * 2 > 3 * (SELECT CAST(SUM(val_cents) AS BIGINT) // COUNT(*) FROM v)"""),
      (s, dir) => {
        Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""
          WITH v AS (SELECT l_partkey,
                            SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS val_cents
                     FROM lineitem GROUP BY l_partkey)
          SELECT l_partkey, val_cents FROM v
          WHERE val_cents * 2 > 3 * (SELECT SUM(val_cents) div COUNT(*) FROM v)""")
      }),

    // ---- q115: min-per-group join-back (TPC-H Q2 shape) — for every
    // size-10 part, the supplier offering the lowest observed unit
    // price, ties broken by suppkey. The rank partitions by partkey on
    // the (part,supp)-grained aggregate — two exchanges total, both on
    // aggregated data, never on raw lineitem. ----
    QuerySpec(
      "q115_cheapest_supplier_per_part",
      Some("""
        WITH offer AS (
          SELECT l_partkey, l_suppkey,
                 MIN(CAST(FLOOR(l_extendedprice/l_quantity*100 + 0.5) AS BIGINT)) AS unit_cents
          FROM lineitem GROUP BY l_partkey, l_suppkey),
        ranked AS (
          SELECT *, RANK() OVER (PARTITION BY l_partkey
                                 ORDER BY unit_cents, l_suppkey) AS rk
          FROM offer)
        SELECT p_partkey, s_suppkey, s_name, unit_cents
        FROM ranked
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        WHERE rk = 1 AND p_size = 10"""),
      (s, dir) => {
        val w = Window.partitionBy(col("l_partkey"))
          .orderBy(col("unit_cents"), col("l_suppkey"))
        Tables.load(s, dir, "lineitem")
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min(floor(col("l_extendedprice") / col("l_quantity") * 100 + 0.5)
            .cast("long")).as("unit_cents"))
          .withColumn("rk", rank().over(w))
          .filter(col("rk") === 1)
          .join(Tables.load(s, dir, "part").filter(col("p_size") === 10),
            col("p_partkey") === col("l_partkey"))
          .join(Tables.load(s, dir, "supplier"),
            col("s_suppkey") === col("l_suppkey"))
          .select(col("p_partkey"), col("s_suppkey"), col("s_name"), col("unit_cents"))
      }),

    // ---- q116: two-dimensional CASE count (TPC-H Q12 shape; no
    // shipmode column, so the second axis is the ship-delay band).
    // datediff is day-granular integer arithmetic on both engines. ----
    QuerySpec(
      "q116_priority_delay_bands",
      Some("""
        SELECT o_orderpriority,
               CASE WHEN date_diff('day', o_orderdate, l_shipdate) < 30 THEN 'fast'
                    WHEN date_diff('day', o_orderdate, l_shipdate) < 90 THEN 'medium'
                    ELSE 'slow' END AS delay_band,
               COUNT(*) AS n_items
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority, delay_band"""),
      (s, dir) => {
        val delay = datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
        Tables.load(s, dir, "orders")
          .join(Tables.load(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"),
            when(delay < 30, "fast").when(delay < 90, "medium").otherwise("slow")
              .as("delay_band"))
          .agg(count(lit(1)).as("n_items"))
      })
  )
}
