package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // Hand-computed fixed-point reference on a 3-node line graph
  //   a(1) -> b(2) -> c(3), plus c -> a closing the cycle, all weight 1.
  // scale=1e9, N=3: r0 = 333333333 each, base = 1e9*15/100/3 = 50000000.
  // Every node has exactly one out-edge, share s = 1000000, so each
  // round is r(v) = base + 85 * r(pred) / 100 (integer div).
  test("pageRankFixedPoint matches hand-rolled fixed-point iteration on a cycle") {
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L)).toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val got = Graph.pageRankFixedPoint(edges, nodes, iterations = 4)
      .orderBy("node").as[(Long, Long)].collect()
    var r = Map(1L -> 333333333L, 2L -> 333333333L, 3L -> 333333333L)
    val pred = Map(1L -> 3L, 2L -> 1L, 3L -> 2L)
    for (_ <- 1 to 4)
      r = r.keys.map { v =>
        // the engine quantizes the share to millionths and divides back:
        // contrib = r * 1000000 div outW=1 -> r * s div 1e6 = r exactly
        v -> (50000000L + 85L * r(pred(v)) / 100L)
      }.toMap
    assert(got.toSeq == Seq(1L, 2L, 3L).map(v => (v, r(v))))
  }

  test("pageRankFixedPoint conserves one row per node incl. isolated/dangling") {
    // node 4 is isolated (teleport-only); node 3 is dangling (in, no out)
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 1L)).toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("node")
    val out = Graph.pageRankFixedPoint(edges, nodes, iterations = 3)
    assert(out.count() == 4)
    val byNode = out.as[(Long, Long)].collect().toMap
    val base = 1000000000L * 15 / 100 / 4
    // isolated node 4: only its zero-share self-loop -> pure teleport mass
    assert(byNode(4L) == base)
    // node 3 receives from both 1 (share 1/4) and 2 (share 1) -> strictly more
    assert(byNode(3L) > byNode(2L))
    // weighted split: 2 gets 3/4 of 1's mass, 3 gets 1/4 + all of 2's
    assert(byNode(2L) > base)
  }

  test("pageRankFixedPoint sums parallel edges before computing shares") {
    val par = Seq((1L, 2L, 1L), (1L, 2L, 2L), (1L, 3L, 3L)).toDF("src", "dst", "w")
    val merged = Seq((1L, 2L, 3L), (1L, 3L, 3L)).toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    assertSameRows(
      Graph.pageRankFixedPoint(par, nodes, 3),
      Graph.pageRankFixedPoint(merged, nodes, 3),
      "parallel-edge merge")
  }

  test("pageRankFixedPoint is invariant to input partitioning and row order") {
    val r = new scala.util.Random(7)
    val edges = Seq.tabulate(200)(i =>
      (r.nextInt(30).toLong, r.nextInt(30).toLong, 1L + r.nextInt(9)))
      .toDF("src", "dst", "w")
    val nodes = (0L until 30L).toDF("node")
    val a = Graph.pageRankFixedPoint(edges, nodes, 4)
    val b = Graph.pageRankFixedPoint(
      edges.repartition(7, col("dst")).sortWithinPartitions(col("w").desc),
      nodes.repartition(3), 4)
    assertSameRows(a, b, "fixed-point ranks must not depend on layout")
  }

  test("pageRankFixedPoint early stop at the integer fixpoint equals full-K") {
    // symmetric cycle converges to the exact uniform fixpoint quickly;
    // once the L1 delta is 0 further rounds provably change nothing
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L)).toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val fullK = Graph.pageRankFixedPoint(edges, nodes, iterations = 60)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val early = Graph.pageRankFixedPoint(edges, nodes, iterations = 60,
      toleranceL1 = 0L).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(early == fullK, "early stop at delta=0 must equal the full-K run")
    // the batched convergence-check cadence must be output-invariant at
    // toleranceL1 = 0: a zero-delta batch means its first round was the
    // fixpoint, and iteration past the fixpoint is idempotent — so any
    // cadence (including one not dividing the fixpoint round) agrees
    for (cadence <- Seq(3, 7, 64)) {
      val batched = Graph.pageRankFixedPoint(edges, nodes, iterations = 60,
        toleranceL1 = 0L, deltaEvery = cadence)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(batched == fullK, s"deltaEvery=$cadence diverged")
    }
    // sanity: the fixture really does reach the fixpoint well before K
    // (uniform mass on a symmetric cycle), so the early path was exercised
    val k12 = Graph.pageRankFixedPoint(edges, nodes, iterations = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k12 == fullK, "fixture must converge before 12 rounds")
  }

  test("pageRankFixedPoint deep-K run with checkpoint cadence matches shallow cadence") {
    val edges = Seq((1L, 2L, 2L), (2L, 1L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val a = Graph.pageRankFixedPoint(edges, nodes, iterations = 15, checkpointEvery = 4,
        maxDriverEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.pageRankFixedPoint(edges, nodes, iterations = 15, checkpointEvery = 100,
        maxDriverEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "lineage truncation must not change values")
  }

  test("pageRankFixedPoint driver regime is bit-identical to the distributed regime") {
    // the maxDriverEdges gate (connectedComponents discipline) must be
    // an accelerator, never a semantics fork: same floors, same sums —
    // with and without early stop, at cadences that do and don't divide
    // the fixpoint round
    val r = new scala.util.Random(11)
    val edges = Seq.tabulate(300)(i =>
      (r.nextInt(40).toLong, r.nextInt(40).toLong, 1L + r.nextInt(9)))
      .toDF("src", "dst", "w")
    val nodes = (0L until 45L).toDF("node") // incl. isolated nodes
    for ((tol, cad) <- Seq((-1L, 1), (0L, 1), (0L, 7))) {
      val driver = Graph.pageRankFixedPoint(edges, nodes, iterations = 25,
        toleranceL1 = tol, deltaEvery = cad)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      val dist = Graph.pageRankFixedPoint(edges, nodes, iterations = 25,
        toleranceL1 = tol, deltaEvery = cad, maxDriverEdges = 0L)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(driver == dist, s"regimes diverged at tol=$tol cadence=$cad")
    }
  }

  test("off-contract edge endpoints degrade identically in both regimes") {
    // an edge endpoint absent from `nodes` is out of contract; the
    // distributed regime silently drops such edges via its inner joins
    // on the score frames. r15: the driver regime must do the SAME
    // (keyed off `nodes`, absent-source terms skipped) — before, a
    // missing source with no in-edges threw NoSuchElementException
    // mid-loop, so which behavior you got depended on maxDriverEdges.
    val edges = Seq(
      (1L, 2L, 3L), (2L, 3L, 1L), (3L, 1L, 2L),
      (50L, 2L, 5L),  // src off-contract, no in-edges → the old crash
      (3L, 60L, 4L)   // dst off-contract
    ).toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("node")
    for (tol <- Seq(-1L, 0L)) {
      val driver = Graph.pageRankFixedPoint(edges, nodes, iterations = 6,
        toleranceL1 = tol)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      val dist = Graph.pageRankFixedPoint(edges, nodes, iterations = 6,
        toleranceL1 = tol, maxDriverEdges = 0L)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(driver == dist, s"pageRank off-contract regimes diverged at tol=$tol")
      assert(driver.keySet.contains(4L), "in-contract isolated node kept")
    }
    val hDriver = Graph.hitsFixedPoint(edges, nodes, iterations = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val hDist = Graph.hitsFixedPoint(edges, nodes, iterations = 4,
        maxDriverEdges = 0L)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(hDriver == hDist, "HITS off-contract regimes diverged")
  }

  test("hitsFixedPoint matches hand-rolled fixed-point iteration on a star") {
    // hub 1 points at authorities 2 and 3 (weights 3 and 1); node 4
    // isolated. ΣW=4 -> shares s(1→2)=750000, s(1→3)=250000.
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("node")
    val scale = 1000000000L
    val got = Graph.hitsFixedPoint(edges, nodes, iterations = 3, scale = scale)
      .as[(Long, Long, Long)].collect()
      .map { case (n, hub, auth) => n -> ((hub, auth)) }.toMap
    // hand iteration (per-edge floor div, L1 renormalization)
    val share = Map((1L, 2L) -> 750000L, (1L, 3L) -> 250000L)
    var h = Map(1L -> scale, 2L -> scale, 3L -> scale, 4L -> scale)
    var a = h
    def norm(m: Map[Long, Long]): Map[Long, Long] = {
      val t = math.max(m.values.sum, 1L)
      m.map { case (k, v) => k -> v * scale / t }
    }
    for (_ <- 1 to 3) {
      a = norm(Seq(2L, 3L, 1L, 4L).map(v =>
        v -> share.collect { case ((s, d), sh) if d == v => sh * h(s) / 1000000L }.sum).toMap)
      h = norm(Seq(2L, 3L, 1L, 4L).map(v =>
        v -> share.collect { case ((s, d), sh) if s == v => sh * a(d) / 1000000L }.sum).toMap)
    }
    assert(got.keySet == Set(1L, 2L, 3L, 4L), "one row per node incl. isolated")
    for (n <- Seq(1L, 2L, 3L, 4L))
      assert(got(n) == ((h(n), a(n))), s"node $n")
    // the structural read: node 1 is the only hub; 2 and 3 are pure
    // authorities with 2 ahead on weight; 4 is neither
    assert(got(1L)._1 > 0 && got(1L)._2 == 0)
    assert(got(2L)._2 > got(3L)._2 && got(2L)._1 == 0)
    assert(got(4L) == ((0L, 0L)))
  }

  test("hitsFixedPoint is invariant to input partitioning and row order") {
    val r = new scala.util.Random(7)
    val edges = Seq.tabulate(40)(i =>
      (r.nextInt(8).toLong, r.nextInt(8).toLong, 1L + r.nextInt(5)))
      .filter(e => e._1 != e._2).toDF("src", "dst", "w")
    val nodes = (0L until 8L).toDF("node")
    val base = Graph.hitsFixedPoint(edges, nodes, iterations = 4)
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1), r0.getLong(2))).toSet
    val rep = Graph.hitsFixedPoint(
        edges.repartition(7, col("dst")).sortWithinPartitions("w"), nodes, iterations = 4)
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1), r0.getLong(2))).toSet
    assert(base == rep)
  }

  test("hitsFixedPoint driver regime is bit-identical to the distributed regime") {
    val r = new scala.util.Random(13)
    val edges = Seq.tabulate(120)(i =>
      (r.nextInt(20).toLong, r.nextInt(20).toLong, 1L + r.nextInt(7)))
      .toDF("src", "dst", "w")
    val nodes = (0L until 24L).toDF("node") // incl. isolated nodes
    val driver = Graph.hitsFixedPoint(edges, nodes, iterations = 6)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val dist = Graph.hitsFixedPoint(edges, nodes, iterations = 6,
        maxDriverEdges = 0L)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(driver == dist, "HITS regimes diverged")
  }

  test("boilerplateShingles is invariant to input partitioning") {
    val r = new scala.util.Random(11)
    val docs = Seq.tabulate(60)(i =>
      (i.toLong, s"s${i % 3}",
        Seq.fill(12)(s"w${r.nextInt(6)}").mkString(" "))).toDF("doc_id", "source", "text")
    assertSameRows(
      CorpusPrep.boilerplateShingles(docs, "source", "text", 2, 3),
      CorpusPrep.boilerplateShingles(docs.repartition(13), "source", "text", 2, 3),
      "boilerplate counts must not depend on layout")
  }

  test("boilerplateShingles finds cross-document template bigrams per source") {
    val docs = Seq(
      // srcA: "legal footer" bigram in 3 docs (one repeats it twice -> still 3)
      (1L, "a", "alpha beta legal footer x"),
      (2L, "a", "legal footer legal footer y"),
      (3L, "a", "z legal footer"),
      (4L, "a", "nothing shared here"),
      // srcB: same words but only 2 docs -> below min_docs=3
      (5L, "b", "legal footer p"),
      (6L, "b", "legal footer q")
    ).toDF("doc_id", "source", "text")
    val got = CorpusPrep.boilerplateShingles(docs, "source", "text", n = 2, minDocs = 3)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "legal footer", 3L)))
  }

  test("classifierScore: seed-frequent terms score positive, others negative") {
    // seed docs (pos) say "good"; non-seed say "bad"; all say "the".
    //   w(good) = 1000·2 div (2+0+1) − 500 = 166
    //   w(bad)  = 1000·0 div (0+2+1) − 500 = −500
    //   w(the)  = 1000·2 div (2+2+1) − 500 = −100
    val docs = Seq(
      (1L, true, "good the"), (2L, true, "good the"),
      (3L, false, "bad the"), (4L, false, "bad the"),
      (5L, false, "")
    ).toDF("doc_id", "seed", "text")
    val gotMap = CorpusPrep.classifierScore(docs, "doc_id", "text", "seed")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(gotMap == Map(
      1L -> (66L, 1L),   // 166 - 100
      2L -> (66L, 1L),
      3L -> (-600L, 0L), // -500 - 100
      4L -> (-600L, 0L)
    ), s"got $gotMap")
    assert(!gotMap.contains(5L), "empty doc has no tokens, no score")
  }

  test("boilerplateShingles counts documents, not occurrences") {
    val docs = Seq(
      (1L, "s", "dup dup dup dup dup"), // many occurrences, ONE doc
      (2L, "s", "dup dup")
    ).toDF("doc_id", "source", "text")
    val got = CorpusPrep.boilerplateShingles(docs, "source", "text", n = 2, minDocs = 2)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("s", "dup dup", 2L)))
  }
}
