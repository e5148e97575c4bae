package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge-list DataFrames.
  *
  * The reference pipeline has no graph stage, but a training-corpus
  * build needs one: domain-authority scoring (a quality prior for web
  * documents) is a PageRank over the inter-domain link graph. The
  * engine form is the classic synchronous power iteration expressed as
  * K join+groupBy rounds — each round shuffles only the EDGE list
  * (grouped by destination), never the corpus, and the edge share
  * table is computed once and persisted across rounds.
  *
  * All arithmetic is 64-bit fixed point (no doubles anywhere), so the
  * result is bit-identical on any engine / partitioning / iteration
  * order — which also puts it under the DuckDB recursive-CTE oracle
  * (q141). */
object Graph {

  /** Fixed-point PageRank.
    *
    * @param edges `(src: long, dst: long, w: long)` weighted directed
    *              edges; parallel edges are summed.
    * @param nodes `(node: long)` the full node set (isolated nodes keep
    *              receiving the teleport share).
    * @param iterations synchronous rounds (K), an upper bound when
    *                   early stop is enabled.
    * @param scale fixed-point denominator for rank mass (default 1e9:
    *              rank·share products stay well under 2^63).
    * @param toleranceL1 early-stop threshold on the L1 delta
    *                    (Σ|r − r_prev|, EXACTLY computable in the
    *                    fixed-point domain), or −1 (default) to
    *                    disable. 0 stops at the exact integer fixpoint
    *                    — further rounds provably change nothing, so
    *                    the result equals any larger K (GraphSpec).
    * @param checkpointEvery lineage truncation cadence for deep-K runs
    *                   (production graphs: K is no longer a magic
    *                   constant bounded by plan depth). q141's K=5
    *                   default never reaches it — plan unchanged.
    * @param deltaEvery convergence-check cadence in tolerance mode:
    *                   the (round-vs-previous-round) L1-delta action
    *                   runs only every `deltaEvery` rounds. At
    *                   toleranceL1 = 0 the result is IDENTICAL for
    *                   every cadence — a zero per-round delta means
    *                   the previous round was the fixpoint, and
    *                   iteration past the fixpoint is idempotent
    *                   (GraphSpec pins cadence equality). For
    *                   toleranceL1 > 0 the stop reads "per-round L1
    *                   delta at a cadence boundary ≤ tolerance".
    * @param maxDriverEdges selects the exact driver-side loop (the
    *                   [[graft.operators.Dedup.connectedComponents]]
    *                   gate discipline): when the SHARE table fits on
    *                   the driver, the identical integer recurrence
    *                   runs in memory — same floor placements, same
    *                   order-insensitive sums, bit-identical output
    *                   (GraphSpec pins regime equality) — collapsing
    *                   K scheduler round-trips to zero. A
    *                   to-convergence run on a small graph (q161's
    *                   25-node trade graph: ~51 rounds) is otherwise
    *                   action-latency-bound, not data-bound: measured
    *                   14 s at BOTH sf0.1 and sf1. Tests force 0 to
    *                   exercise the distributed regime, which remains
    *                   the 10⁸⁺-edge scale path.
    *
    * Determinism: per-edge transition shares are pre-quantized to
    * millionths (`w·1e6 div outW`), per-round contributions are
    * `r·s div 1e6`, and the damping mix is `base + 85·sum div 100` —
    * integer ops only, so the sum is order-insensitive and floor
    * placement is fixed. Dangling mass (nodes with no out-edges) is
    * dropped, the standard simplification; every node stays addressable
    * through a zero-share self-loop so the result always has one row
    * per node.
    *
    * Scale: the corpus-sized object here is `edges` (domains link a
    * lot); each round is one shuffle of the edge join keyed by `dst`
    * with map-side partial aggregation. `ranks` is one row per NODE —
    * orders of magnitude smaller — and broadcast-joins into the edge
    * scan when it fits, so rounds never shuffle twice. */
  def pageRankFixedPoint(
      edges: DataFrame, nodes: DataFrame,
      iterations: Int = 5, scale: Long = 1000000000L,
      toleranceL1: Long = -1L, checkpointEvery: Int = 10,
      deltaEvery: Int = 1, maxDriverEdges: Long = 5000000L): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    require(iterations >= 1 && scale >= 1000000L && checkpointEvery >= 1 &&
      deltaEvery >= 1)
    val dedup = edges.groupBy("src", "dst").agg(sum("w").as("w"))
    val outw = dedup.groupBy("src").agg(sum("w").as("_outw"))
    // transition shares in millionths; zero-share self-loops keep every
    // node (isolated or dangling-only-in) present in each round's output
    // outw is one row per node with out-edges — node-sized, like ranks:
    // broadcast it so share computation never re-shuffles the edge list
    val eshare = dedup.join(broadcast(outw), "src")
      .select(col("src"), col("dst"), expr("w * 1000000 div _outw").as("s"))
      .unionByName(nodes.select(
        col("node").as("src"), col("node").as("dst"), lit(0L).as("s")))
      .persist(MEMORY_AND_DISK) // referenced once per round
    val n = nodes.count()
    require(n > 0, "empty node set")
    val base = scale * 15 / 100 / n
    // the gate reads the share-table size (and populates its cache);
    // shares, not raw edges, are what either regime iterates over
    val edgeCount = eshare.count()
    if (edgeCount <= maxDriverEdges) {
      // Exact driver regime (the connectedComponents gate discipline):
      // the SAME integer recurrence — r'(dst) = base + 85·Σ(r(src)·s
      // div 1e6) div 100, sums order-insensitive, floors identical —
      // over the collected share table, so the output is bit-identical
      // to the distributed loop (GraphSpec pins it) with ZERO per-round
      // scheduler trips. Ranks are keyed off the NODES frame (exactly
      // the distributed regime's round-0 ranks), and an edge whose src
      // holds no rank contributes nothing — mirroring the distributed
      // inner join on src — so an off-contract edge endpoint absent
      // from `nodes` degrades to the same silent drop in BOTH regimes
      // instead of crash-vs-drop depending on maxDriverEdges (r15;
      // GraphSpec pins the off-contract regime equality too).
      val es = eshare.select(col("src"), col("dst"), col("s")).collect()
      val r0 = scale / n
      var r = scala.collection.mutable.LongMap.empty[Long]
      nodes.select(col("node")).collect()
        .foreach(row => r.update(row.getLong(0), r0))
      var round = 0
      var converged = false
      while (round < iterations && !converged) {
        val sums = scala.collection.mutable.LongMap.empty[Long]
        es.foreach { row =>
          r.get(row.getLong(0)).foreach { rs =>
            val term = rs * row.getLong(2) / 1000000L
            sums.update(row.getLong(1), sums.getOrElse(row.getLong(1), 0L) + term)
          }
        }
        val next = scala.collection.mutable.LongMap.empty[Long]
        sums.foreach { case (node, s) => next.update(node, base + 85 * s / 100) }
        round += 1
        if (toleranceL1 >= 0L && round % deltaEvery == 0) {
          // the distributed delta is an inner join of consecutive rank
          // frames — only nodes present in both contribute
          var delta = 0L
          next.foreach { case (node, v) =>
            r.get(node).foreach(p => delta += math.abs(v - p))
          }
          converged = delta <= toleranceL1
        }
        r = next
      }
      eshare.unpersist(false)
      val spark = edges.sparkSession
      import spark.implicits._
      r.toSeq.map { case (node, v) => (node, v) }.toDF("node", "r")
    } else {
      var ranks = nodes.select(col("node"), lit(scale / n).as("r"))
      // ranks is 16 bytes per NODE — a broadcast up to ~10^8-node
      // graphs on production executors, and the hint is load-bearing:
      // round ≥2 ranks are aggregate outputs with unknown stats, which
      // the static planner would otherwise SMJ, re-sorting the edge
      // list K times. (Beyond that regime the extension is a
      // src-bucketed shuffled hash join; the edge shuffle below
      // dominates either way.)
      var round = 0
      var converged = false
      while (round < iterations && !converged) {
        val next = eshare
          .join(broadcast(ranks.withColumnRenamed("node", "src")), "src")
          .groupBy(col("dst"))
          .agg(expr(s"$base + 85 * sum(r * s div 1000000) div 100").as("r"))
          .select(col("dst").as("node"), col("r"))
        round += 1
        if (toleranceL1 >= 0L) {
          // every round is localCheckpointed (the broadcast executes it
          // anyway; truncation keeps lineage flat), but the L1-delta
          // ACTION runs only at the deltaEvery cadence — at tolerance 0
          // the result is cadence-independent (see scaladoc)
          val mat = next.localCheckpoint(true)
          if (round % deltaEvery == 0) {
            val delta = mat
              .join(ranks.select(col("node"), col("r").as("_rp")), "node")
              .agg(sum(abs(col("r") - col("_rp"))).as("_d"))
              .head().getLong(0)
            converged = delta <= toleranceL1
          }
          ranks = mat
        } else {
          ranks =
            if (round % checkpointEvery == 0) next.localCheckpoint(true)
            else next
        }
      }
      ranks
    }
  }

  /** Fixed-point HITS (Kleinberg hubs & authorities) — the OTHER
    * classic link-analysis prior next to PageRank: an authority is
    * pointed at by good hubs, a hub points at good authorities. In a
    * corpus build the two scores separate content pages (authorities)
    * from link/directory pages (hubs) — a quality signal PageRank's
    * single score conflates.
    *
    * Determinism: edge weights pre-quantize to GLOBAL millionth shares
    * (`w·1e6 div ΣW` — Σ of all shares ≤ 1e6, which is also the int64
    * overflow guard at any graph size: per-edge products are
    * `s·v div 1e6` ≤ scale, and each round renormalizes to L1 mass
    * `scale` with `v·scale div Σv` — every product stays ≤ 1e18).
    * Integer ops only ⇒ bit-identical across engines, so the whole
    * K-round iteration replays under the DuckDB oracle (q189 unrolls
    * the rounds as chained CTEs — no recursive normalization needed).
    *
    * Scale topology (the q141 discipline): the corpus-sized object is
    * the edge list; each half-round is ONE edge-keyed join + grouped
    * sum with map-side partials; scores are node-sized and broadcast;
    * zero-share self-loops keep isolated nodes addressable, so the
    * output always has one row per node. Every half-round is eagerly
    * checkpointed (see normalize below), so lineage depth is constant
    * at any K.
    *
    * `maxDriverEdges` selects the exact driver-side loop (the
    * [[pageRankFixedPoint]] gate): when the share table fits on the
    * driver, the identical integer recurrence — including both
    * renormalizations per round — runs in memory, bit-identical
    * (GraphSpec pins regime equality), collapsing 4·K scheduler
    * round-trips (2 checkpoints + 2 scalar fetches per round) to zero.
    * Tests force 0 to exercise the distributed regime — the 10⁸⁺-edge
    * scale path. */
  def hitsFixedPoint(
      edges: DataFrame, nodes: DataFrame,
      iterations: Int = 8, scale: Long = 1000000000L,
      maxDriverEdges: Long = 5000000L): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    require(iterations >= 1 && scale >= 1000000L)
    val dedup = edges.groupBy("src", "dst").agg(sum("w").as("w"))
    val tot = dedup.agg(sum("w").as("_wt"))
    val es = dedup.crossJoin(broadcast(tot))
      .select(col("src"), col("dst"), expr("w * 1000000 div _wt").as("s"))
      .unionByName(nodes.select(
        col("node").as("src"), col("node").as("dst"), lit(0L).as("s")))
      .persist(MEMORY_AND_DISK) // referenced twice per round
    // node-sized normalization over the MATERIALIZED raw scores. Two
    // deliberate choices, both measured:
    //   - every half-round ends in an eager localCheckpoint: unlike
    //     pageRank's single linear join chain, a HITS round nests two
    //     joins plus normalization, and letting even TWO rounds stack
    //     up lazily sends Catalyst's planning time superlinear (K=8
    //     fully lazy never finished planning; a lazy-every-other-round
    //     variant benched 3× slower than eager-every-round);
    //   - the L1 total is a 1-row driver fetch over the checkpointed
    //     frame (the catalog's bounded-driver-fetch precedent — the
    //     BPE trainer's per-round argmax), NOT a broadcast cross join:
    //     the cross-join form re-runs a broadcast-exchange job per
    //     half-round and benched ~1.6× slower at sf0.1. The fetch is
    //     node-grain-aggregate-sized (8 bytes) at any graph size.
    val edgeCount = es.count()
    if (edgeCount <= maxDriverEdges) {
      // Exact driver regime: the SAME half-round recurrence and both
      // renormalizations — Σ(s·v div 1e6) per node, then v·scale div
      // max(Σv, 1) — over the collected share table; identical floors,
      // order-insensitive integer sums, bit-identical to the
      // distributed loop below (GraphSpec pins it).
      val rows = es.select(col("src"), col("dst"), col("s")).collect()
      def normalizeM(m: scala.collection.mutable.LongMap[Long])
          : scala.collection.mutable.LongMap[Long] = {
        var t = 0L
        m.foreach { case (_, v) => t += v }
        t = math.max(t, 1L)
        val out = scala.collection.mutable.LongMap.empty[Long]
        m.foreach { case (node, v) => out.update(node, v * scale / t) }
        out
      }
      // score maps are keyed off the NODES frame (the distributed
      // regime's round-0 h), and a half-round term whose source score
      // is absent contributes nothing — mirroring the distributed
      // inner joins on src/dst — so off-contract edge endpoints absent
      // from `nodes` degrade identically in both regimes (r15)
      var h = scala.collection.mutable.LongMap.empty[Long]
      nodes.select(col("node")).collect()
        .foreach(r => h.update(r.getLong(0), scale))
      var a = h
      var round = 1
      while (round <= iterations) {
        val araw = scala.collection.mutable.LongMap.empty[Long]
        rows.foreach { r =>
          h.get(r.getLong(0)).foreach { hv =>
            val term = r.getLong(2) * hv / 1000000L
            araw.update(r.getLong(1), araw.getOrElse(r.getLong(1), 0L) + term)
          }
        }
        a = normalizeM(araw)
        val hraw = scala.collection.mutable.LongMap.empty[Long]
        rows.foreach { r =>
          a.get(r.getLong(1)).foreach { av =>
            val term = r.getLong(2) * av / 1000000L
            hraw.update(r.getLong(0), hraw.getOrElse(r.getLong(0), 0L) + term)
          }
        }
        h = normalizeM(hraw)
        round += 1
      }
      es.unpersist(false)
      val spark = edges.sparkSession
      import spark.implicits._
      // the distributed final result is h INNER JOIN a on node
      h.toSeq.flatMap { case (node, hv) => a.get(node).map(av => (node, hv, av)) }
        .toDF("node", "hub_fp", "auth_fp")
    } else {
      def normalize(raw: DataFrame): DataFrame = {
        val mat = raw.localCheckpoint(true)
        val t = math.max(Option(mat.agg(sum("v")).head().get(0))
          .map(_.asInstanceOf[Long]).getOrElse(0L), 1L)
        mat.select(col("node"), expr(s"v * $scale div ${t}L").as("v"))
      }
      var h = nodes.select(col("node"), lit(scale).as("v"))
      var a = h
      var round = 1
      while (round <= iterations) {
        val araw = es
          .join(broadcast(h.select(col("node").as("src"), col("v").as("hv"))), "src")
          .groupBy(col("dst"))
          .agg(sum(expr("s * hv div 1000000")).as("v"))
          .select(col("dst").as("node"), col("v"))
        a = normalize(araw)
        val hraw = es
          .join(broadcast(a.select(col("node").as("dst"), col("v").as("av"))), "dst")
          .groupBy(col("src"))
          .agg(sum(expr("s * av div 1000000")).as("v"))
          .select(col("src").as("node"), col("v"))
        h = normalize(hraw)
        round += 1
      }
      h.select(col("node"), col("v").as("hub_fp"))
        .join(a.select(col("node"), col("v").as("auth_fp")), "node")
    }
  }
}
