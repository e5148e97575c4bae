package graft

import org.apache.spark.sql.functions._

/** Physical-plan guards: assert the plans stay the plans we designed for
  * scale (pushdown reaching the parquet scan, broadcast joins on dims,
  * map-side partial aggregation, whole-stage codegen presence) so a
  * refactor can't silently regress them. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q01: shipdate filter and column pruning reach the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"),
      s"scan reads columns the query never touches: $readSchema")
  }

  test("q02: dimension joins broadcast, fact side never exchanges pre-agg") {
    val p = plan("q02_orders_by_nation_priority")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim join degraded to SMJ:\n$p")
  }

  test("linear-in-SF dims are UNHINTED yet still broadcast at bench scale") {
    // r16 (verdict item 2): customer/part/supplier grow with SF, so
    // their broadcast() hints were removed — stats/AQE must still pick
    // BHJ wherever the frame fits. If this fails after a refactor, the
    // fix is NOT to restore a static hint (that OOMs at 100 TB): check
    // why the planner lost the size estimate.
    for (q <- Seq("q03_top_priority_per_nation", "q113_nation_year_revenue")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: expected BHJ:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"$q: unhinted dim join degraded to SMJ at bench scale:\n$p")
    }
  }

  test("q01: aggregation is partial then final (map-side combine)") {
    val p = plan("q01_pricing_summary")
    val hashAggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"expected partial+final HashAggregate:\n$p")
  }

  test("q14: anti join broadcasts") {
    val p = plan("q14_customers_without_orders")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"expected broadcast anti join:\n$p")
  }

  test("whole-stage codegen active on the agg pipeline") {
    // AQE prints the initial plan until the query's own plan executes
    val df = SparkEntry.queries("q04_orders_per_year_status")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p)
    assert(p.contains("*(1) "), s"no whole-stage-codegen stages:\n$p")
  }

  test("ANN top-k: partial ObjectHashAggregate before the exchange") {
    val p = plan("q41_ann_bruteforce_topk")
    // the bounded-heap aggregator must run in partial mode below the
    // shuffle: look for two ObjectHashAggregate occurrences
    val objAggs = p.linesIterator.count(_.contains("ObjectHashAggregate"))
    assert(objAggs >= 2, s"top-k not partially aggregated map-side:\n$p")
  }

  test("pipeline task4: join on ind broadcasts the aggregated side or dims") {
    val p = plan("q60_pipeline_task4_top_category_per_country")
    assert(p.contains("Join"), p)
  }

  test("q70: dim joins broadcast; returnflag-style filters pushed to scans") {
    val p = plan("q70_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), s"dims must broadcast:\n$p")
    // region filter must prune before the join tree executes fully —
    // r_name IN (...) should appear as a pushed filter or early Filter
    assert(p.contains("In(r_name, [ASIA,EUROPE])"),
      s"region predicate not pushed to the region scan:\n$p")
  }

  test("q72: selective l_returnflag filter reaches the lineitem scan") {
    val p = plan("q72_top_return_customers")
    assert(p.contains("EqualTo(l_returnflag,R)"),
      s"returnflag filter not pushed:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-N must be TakeOrderedAndProject, not global sort:\n$p")
  }

  test("q47 decontaminate: broadcast LEFT ANTI — corpus never shuffles") {
    val p = plan("q47_decontaminate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"expected broadcast anti join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"anti join degraded to SMJ:\n$p")
  }

  test("q50 sessionize: exactly one row-level exchange (windows share partitioning)") {
    val p = plan("q50_sessionize_events")
    val exchanges = p.linesIterator.count(l =>
      l.trim.startsWith("+- Exchange") || l.trim.startsWith(":- Exchange")
        || l.trim.startsWith("Exchange"))
    assert(exchanges <= 2, // window shuffle + (AQE-planned) agg reuse
      s"sessionize should not re-shuffle between LAG/sum/groupBy:\n$p")
  }

  test("q06 global top-1 is TakeOrderedAndProject (no global sort)") {
    val p = plan("q06_top_customer_global")
    assert(p.contains("TakeOrderedAndProject"), s"LIMIT 1 plan degraded:\n$p")
  }

  test("q140: percentile band joins back as a broadcast, never SMJ") {
    val p = plan("q140_winsorized_event_stats")
    assert(p.contains("BroadcastHashJoin"), s"band join should broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"one-row-per-type band degraded to SMJ:\n$p")
  }

  test("q141: pagerank rounds keep ranks on the broadcast side (no SMJ rounds)") {
    // each of the K rounds joins the persisted edge-share table with the
    // one-row-per-node ranks frame; at any scale ranks ≪ edges, so every
    // round must plan a hash join with ranks built/broadcast — an SMJ
    // would re-sort the edge list K times
    val p = plan("q141_pagerank_trade_graph")
    assert(!p.contains("SortMergeJoin"), s"pagerank round degraded to SMJ:\n$p")
  }

  test("catalog-wide guard: no accidental nested-loop or cartesian joins") {
    // queries that INTENTIONALLY score all pairs (brute-force ground
    // truth) or broadcast-scan a tiny centroid table: BNLJ is the design
    val deliberate = Set(
      "q20_like_nullout",          // 1-row grand-total broadcast cross join (replaces global window)
      "q138_mixture_rebalance",    // 1-row achievable-total broadcast cross join (same pattern as q20)
      "q39_jaccard_top_pairs",     // brute Jaccard baseline (bounded slice)
      "q41_ann_bruteforce_topk",   // exact ANN ground truth
      "q44_ann_ivf_topk",          // centroid assignment: corpus x 16 centroids
      "q49_ann_ivf_kmeans_topk",   // same, trained centroids
      "q86_ann_quantized_exact_topk", // quantized exact search baseline
      "q90_ann_ivf_quantized_topk",   // centroid assignment, quantized twin
      "q153_semantic_dedup_quantized", // centroid assignment: corpus x 12 pinned centroids (q90 pattern)
      "q160_semantic_dedup_capped",    // same assignment scan, capped-pairs path
      "q164_bm25_topk",                // 1-row (N, L) corpus-stats broadcast cross join (q20 pattern)
      "q165_bigram_lm_quality",        // 1-row vocab-size broadcast cross join (q20 pattern)
      "q167_ann_ivfpq_topk",           // centroid assignment: corpus x 16 centroids (q90 pattern)
      "q168_contrastive_triplets",     // hard-negative scan: corpus x bounded anchor broadcast (q86 pattern)
      "q171_more_like_this",           // 1-row corpus-count broadcast cross join (q20 pattern)
      "q172_ann_recall_eval",          // exact-baseline side IS the deliberate q86 brute scan
      "q173_ann_pq_trained_recall",    // same exact-baseline brute scan, trained-codebook variant
      "q177_dsir_importance",          // 1-row feature-total broadcast cross join (q20 pattern)
      "q178_mixture_temperature_sample", // 1-row (n_tot, s_tot) broadcast cross join (q20 pattern)
      "q179_ann_sq8_recall",           // brute exact baseline + 1-row SQ codebook broadcast (q172/q20)
      "q180_pmi_collocations",         // 1-row bigram-total broadcast cross join (q20 pattern)
      "q181_dsir_incremental",         // 1-row feature-total broadcast cross join (q177 pattern)
      "q182_containment_pairs",        // 1-row corpus-count broadcast cross join (q171 pattern)
      "q183_ql_dirichlet_topk",        // 1-row corpus-token-total broadcast cross join (q164 pattern)
      "q185_rrf_fusion",               // same 1-row stats cross joins via both rankers (q164 pattern)
      "q187_ir_metrics",               // 1-row stats cross join via bm25FromPostings (q164 pattern)
      "q186_ann_sq8_refine",           // SQ8 candidate scan + 1-row codebook broadcast (q179 pattern)
      "q188_lsh_recall_eval",          // brute Jaccard truth over the bounded eval slice (q39 pattern)
      "q189_hits_trade_graph",         // 1-row edge-total broadcast cross join (round totals are driver fetches)
      "q190_ivf_incremental",          // frozen-centroid assignment: corpus x 16 broadcast (q90 pattern)
      "q191_containment_after_neardedup", // 1-row kept-count broadcast cross join (q182 pattern)
      "q193_dsir_disjoint_score",      // 1-row feature-total broadcast cross join (q177 pattern)
      "q196_oph_recall_eval",          // brute Jaccard truth over the bounded eval slice (q188 pattern)
      "q200_ccnet_ppl_buckets",        // 1-row vocab-size broadcast cross join via the q165 core
      "q203_curated_scrub_export",     // 1-row kept-count broadcast cross join via containment (q191 pattern)
      "q208_margin_mining",            // mining-batch scan: corpus x bounded (<200 even-id) broadcast (q86/q168 pattern)
      "q209_diversity_sample",         // centroid assignment: corpus x 16 centroids (q90 pattern)
      "q210_ann_ivf_kmeans_quantized_topk") // centroid assignment: corpus x 8 TRAINED centroids (q90 pattern)
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(deliberate)
      .flatMap { name =>
        val p = try SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"$name failed to plan: $e") }
        if (p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"))
          Some(name)
        else None
      }
    assert(offenders.isEmpty,
      s"unexpected nested-loop/cartesian joins in: $offenders")
  }

  test("catalog-wide guard: no unpartitioned WindowExec (global single-reducer)") {
    // An empty partitionSpec moves the ENTIRE input to one partition —
    // the "WindowExec: No Partition Defined" warning, and a
    // single-reducer stage at 100 TB. The catalog must express grand
    // totals as 1-row aggregates broadcast back (q20), global
    // top-ranks as max-equality join-backs (q111), and global prefix
    // sums as bucket decompositions with driver-side bounded offsets
    // (q89) — never as global windows. NO whitelist: zero queries may
    // plan one. Checked on the optimized logical plan (AQE-safe).
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .flatMap { name =>
        val plan = try SparkEntry.queries(name)(spark, sf)
          .queryExecution.optimizedPlan
        catch { case e: Throwable => fail(s"$name failed to plan: $e") }
        val global = plan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }
        if (global.nonEmpty) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"unpartitioned (global) window in: $offenders")
  }

  test("q20: grand total is a broadcast 1-row aggregate, not a global window") {
    val p = plan("q20_like_nullout")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"total must come back via broadcast join:\n$p")
    assert(!p.contains("Window"), s"q20 must not contain a window:\n$p")
  }

  test("q111: top supplier via broadcast max join-back, no global window or SMJ") {
    val p = plan("q111_top_revenue_supplier")
    assert(!p.contains("Window"), s"q111 must not rank via global window:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"max and supplier join-backs must broadcast:\n$p")
    // the rev aggregate feeds both the join and its own max: AQE must
    // REUSE the supplier-grain shuffle stage (one fact-table pass) —
    // this needs the branches' constraint sets to canonicalize equal,
    // which the explicit suppkey non-null filter guarantees
    val df = SparkEntry.queries("q111_top_revenue_supplier")(spark, sf)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      s"fact scan must execute once (stage reuse):\n${df.queryExecution.executedPlan}")
  }

  test("q124: skew-split token join — heavy side broadcasts (hot keys never shuffle tok)") {
    val p = plan("q124_rare_token_profile")
    assert(p.contains("BroadcastHashJoin"),
      s"heavy head + heavy DFs must come back via broadcast joins:\n$p")
  }

  test("q103: Q21 shape is ONE lineitem pass (aggregate form, not 3-way self-join)") {
    val p = plan("q103_sole_returned_supplier")
    assert(p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("lineitem")) <= 1 &&
      p.linesIterator.count(_.contains("Scan parquet")) <= 2,
      s"the correlated subqueries must fold into one order-grain aggregate:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"supplier join must broadcast:\n$p")
  }

  test("q126: fused signal pass is ONE scan with zero aggregation exchanges") {
    val p = plan("q126_fused_signal_pass")
    assert(p.linesIterator.count(_.contains("Scan parquet")) == 1,
      s"fused pass must read the corpus once:\n$p")
    // the only exchange permitted is the kernel fan-out's round-robin —
    // no hash exchange means no aggregation/join shuffles in the pass
    assert(!p.contains("hashpartitioning"),
      s"fused pass must not shuffle by key:\n$p")
  }

  test("q123: eval grams broadcast; the corpus side never hash-exchanges pre-join") {
    val p = plan("q123_contamination_stats")
    assert(p.contains("BroadcastHashJoin"), s"eval side must broadcast:\n$p")
  }

  test("q129: Misra-Gries aggregates partially map-side (object hash agg)") {
    val p = plan("q129_frequent_tokens_by_lang")
    val objAggs = p.linesIterator.count(_.contains("ObjectHashAggregate"))
    assert(objAggs >= 2,
      s"expected partial+final ObjectHashAggregate (bounded summaries cross the exchange):\n$p")
  }

  test("q127: fuzzy pairs plan is an equi-join on the variant key, not a theta join") {
    val p = plan("q127_fuzzy_prefix_pairs")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"variant match must be an equi-join:\n$p")
  }

  test("q201: pair-side source lookups broadcast under the measured gate") {
    // r15: the broadcast hint on the verified pair set is GATED on a
    // measured pair count (the set is unbounded by construction — on a
    // replica-heavy 100 TB crawl it is billions of rows and a forced
    // hint OOMs the driver). At test scale the gate passes, so both
    // source lookups must still be broadcast joins, never SMJ.
    val p = plan("q201_source_overlap_matrix")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      s"both pair-side lookups must broadcast at test scale:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"pair lookups degraded to SMJ:\n$p")
  }

  test("q184: tag-union single-kernel plan — one Generate, no kernel above it") {
    // r15: the tokenize+shingle kernel must appear exactly once, inside
    // the Generate. Two regressions this guards: (a) the r14 join-back
    // shape, which ran the kernel twice and exchanged the shingle
    // stream twice; (b) the Catalyst Generate-collapse trap — a
    // `size(arr)` projected NEXT TO the explode gets collapsed ABOVE
    // the Generate and re-runs the whole kernel per exploded row
    // (measured 8× at sf1). The sentinel's posexplode position carries
    // n_shingles instead, so `text` is dead above the Generate.
    val p = plan("q184_ngram_novelty")
    assert(!p.contains("SortMergeJoin") && !p.contains("Join"),
      s"single-tree shape must have no join:\n$p")
    val kernelEvals = p.linesIterator.count(_.contains("array_distinct"))
    assert(kernelEvals == 1,
      s"shingle kernel must appear exactly once (in the Generate), got $kernelEvals:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2,
      s"expected only the shingle + doc-grain exchanges, got $exchanges:\n$p")
  }
}
