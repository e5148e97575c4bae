package graft.operators

import graft.SparkSpec
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.functions._

/** Dedup operators against constructed near-duplicates and brute-force
  * ground truth. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  // 0/1: exact duplicates. 2/3: near-duplicates (one word changed in
  // 20). 4: unrelated. 5/6: case/whitespace-only variants.
  private val baseText =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
  private lazy val docs = Seq(
    (0L, baseText),
    (1L, baseText),
    (2L, baseText.replace("kappa", "kilo")),
    (3L, baseText.replace("sigma", "sierra")),
    (4L, "totally different content about spark engines and scale"),
    (5L, baseText.toUpperCase),
    (6L, "  " + baseText.replaceAll(" ", "   ") + "  ")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content, elects min-id keeper") {
    val out = Dedup.exact(docs, "doc_id", Seq("text"))
      .select("doc_id", "keep_id", "is_duplicate")
      .as[(Long, Long, Boolean)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(0L) == (0L, false))
    assert(out(1L) == (0L, true))
    assert(out(2L) == (2L, false)) // near-dup is NOT an exact dup
    assert(out(5L) == (5L, false)) // case differs → different exact hash
  }

  test("normalized exact dedup folds case/whitespace variants") {
    val out = Dedup.exactNormalized(docs, "doc_id", "text")
      .select("doc_id", "keep_id").as[(Long, Long)].collect().toMap
    assert(out(5L) == 0L, "uppercase variant folds into keeper 0")
    assert(out(6L) == 0L, "whitespace variant folds into keeper 0")
    assert(out(4L) == 4L)
  }

  test("minhash LSH finds the high-jaccard pairs brute force finds") {
    val brute = Dedup.jaccardPairsBrute(docs, "doc_id", "text")
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "fixture must contain high-jaccard pairs")
    val lsh = Dedup.minhashCandidatePairs(
      docs, "doc_id", "text", shingleSize = 3, numHashes = 64, bands = 32,
      threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // verification step uses EXACT jaccard, so lsh ⊆ brute always;
    // with 32 bands of 2 rows recall on j≥0.5 pairs is ~1 at this size
    assert(lsh.subsetOf(brute), s"LSH produced non-ground-truth pairs: ${lsh -- brute}")
    assert(lsh == brute, s"LSH missed pairs: ${brute -- lsh}")
  }

  test("minhashLsh keeper election: duplicates point at smallest partner") {
    val out = Dedup.minhashLsh(docs, "doc_id", "text",
      numHashes = 64, bands = 32, threshold = 0.5)
      .select("doc_id", "keep_id").as[(Long, Long)].collect().toMap
    assert(out(1L) == 0L)
    assert(out(4L) == 4L, "unrelated doc keeps itself")
    assert(out.size == 7, "one row per input row")
  }

  test("connectedComponents: chains collapse to one keeper (transitive)") {
    // chain 10~11, 11~12, plus isolated pair 20~21 and singleton 30
    val nodes = Seq(10L, 11L, 12L, 20L, 21L, 30L).toDF("doc_id")
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(nodes, "doc_id", pairs)
      .select("doc_id", "keep_id").as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L))
    // contrast: single-hop keeperFrom leaves 12 pointing at 11
    val hop = Dedup.keeperFrom(nodes, "doc_id", pairs)
      .select("doc_id", "keep_id").as[(Long, Long)].collect().toMap
    assert(hop(12L) == 11L && got(12L) == 10L)
  }

  test("connectedComponents distributed regime: long chain converges to fixpoint") {
    // 12-hop chain — would silently split under the old fixed-6-round
    // propagation; maxDriverEdges=0 forces the distributed path
    // (VERDICT r1 wrong#3)
    val chain = (100L to 112L)
    val nodes = chain.toDF("doc_id")
    val pairs = chain.sliding(2).map(w => (w(0), w(1))).toSeq.toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(nodes, "doc_id", pairs, maxDriverEdges = 0L)
      .select("doc_id", "keep_id").as[(Long, Long)].collect().toMap
    assert(got.size == 13)
    assert(got.values.toSet == Set(100L), s"chain must collapse to one keeper: $got")
  }

  test("connectedComponents: driver and distributed regimes agree") {
    val nodes = Seq(10L, 11L, 12L, 20L, 21L, 30L).toDF("doc_id")
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val driver = Dedup.connectedComponents(nodes, "doc_id", pairs)
      .select("doc_id", "keep_id").as[(Long, Long)].collect().toMap
    val dist = Dedup.connectedComponents(nodes, "doc_id", pairs, maxDriverEdges = 0L)
      .select("doc_id", "keep_id").as[(Long, Long)].collect().toMap
    assert(driver == dist)
  }

  test("hot LSH buckets are capped: 1k identical docs stay linear, still fully dedup") {
    // every band bucket is degenerate (all 1000 docs identical) — the
    // uncapped self-join would emit ~500k candidate pairs; the star cap
    // bounds it to n-1 while transitive closure still finds one cluster
    val many = (0L until 1000L).map(i => (i, "the same boilerplate text repeated everywhere"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidatePairs(many, "doc_id", "text",
      threshold = 0.5, hotBucketCap = 50)
    val nPairs = pairs.count()
    assert(nPairs == 999L, s"star cap should emit n-1 pairs, got $nPairs")
    val cc = Dedup.connectedComponents(many, "doc_id", pairs)
    assert(cc.filter(col("keep_id") === 0L).count() == 1000L,
      "all identical docs must collapse to the min-id keeper")
    // simhash path: same cap, same bound
    val sPairs = Dedup.simhashPairs(many, "doc_id", "text", hotBucketCap = 50)
    assert(sPairs.count() == 999L)
  }

  test("simhash: identical texts equal, near-dups close, unrelated far") {
    val sims = Dedup.simhashes(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sims(0L) == sims(1L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sims(0L), sims(2L)) <= 16,
      s"near-dup hamming too large: ${hamming(sims(0L), sims(2L))}")
    assert(hamming(sims(0L), sims(4L)) > 16,
      s"unrelated hamming too small: ${hamming(sims(0L), sims(4L))}")
  }

  test("simhashPairs candidate banding finds exact-duplicate pair") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "unrelated doc must not pair")
  }

  test("decontaminate drops blocklisted content incl. normalized variants") {
    val corpus = Seq((1L, "keep me"), (2L, "Remove   Me"), (3L, "also keep"))
      .toDF("doc_id", "text")
    val block = Seq("remove me").toDF("text")
    val kept = Dedup.decontaminate(corpus, "text", block, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L), "case/whitespace variant of blocked text must drop")
  }

  test("decontaminateBloom == decontaminate, even under a collision-heavy filter") {
    val corpus = (0L until 400L).map(i => (i, s"document number $i body")).toDF("doc_id", "text")
    val block = (0L until 400L by 7).map(i => s"Document   NUMBER $i BODY").toDF("text")
    val exact = Dedup.decontaminate(corpus, "text", block, "text")
    // generous filter: false positives rare, exact join still corrects
    val viaBloom = Dedup.decontaminateBloom(corpus, "text", block, "text")
    assertSameRows(viaBloom, exact, "bloom path vs plain anti-join")
    // 64-bit filter: nearly everything is a false positive → the exact
    // verification join must carry the result alone
    val viaTinyBloom = Dedup.decontaminateBloom(corpus, "text", block, "text",
      expectedItems = 4L, numBits = 64L)
    assertSameRows(viaTinyBloom, exact, "bloom exactness must not depend on fpp")
    // empty blocklist: identity
    val empty = Dedup.decontaminateBloom(corpus, "text",
      block.filter(lit(false)), "text")
    assertSameRows(empty, corpus, "empty blocklist drops nothing")
  }

  test("dedupIncremental: batch keepers minus index content, exact under tiny bloom") {
    // index holds docs 0,2 (by content); tonight's batch: a dup of an
    // indexed doc (normalized variant), an internal dup pair, and fresh
    // content — survivors are the min-id keeper of each NEW group
    val index = Seq("alpha body text", "beta body text").toDF("t")
      .select(md5(graft.functions.TextFunctions.normalizeText(col("t"))).as("h"))
    val batch = Seq(
      (10L, "ALPHA   body TEXT"),   // indexed content, normalized variant → drop
      (11L, "gamma body text"),     // fresh, dup of 12 → keeper
      (12L, "Gamma BODY text"),     // within-batch dup → drop
      (13L, "delta body text")      // fresh singleton → keeper
    ).toDF("doc_id", "text")
    val got = Dedup.dedupIncremental(batch, "doc_id", "text", index, "h")
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(11L, 13L), s"got $got")
    // collision-heavy filter: everything bloom-positive → the exact
    // anti-join must carry the result alone (false positives may cost a
    // re-check, never a wrong drop)
    val tiny = Dedup.dedupIncremental(batch, "doc_id", "text", index, "h",
      expectedItems = 2L, numBits = 64L)
      .select("doc_id").as[Long].collect().toSet
    assert(tiny == Set(11L, 13L), s"tiny-bloom got $tiny")
    // empty index: pure within-batch dedup
    val noIdx = Dedup.dedupIncremental(batch, "doc_id", "text",
      index.filter(lit(false)), "h")
      .select("doc_id").as[Long].collect().toSet
    assert(noIdx == Set(10L, 11L, 13L), s"empty-index got $noIdx")
  }

  test("dedupIncrementalHamming: within-batch keepers + Hamming-ball index drops, exact under tiny bloom") {
    // index holds signature 0xF0; batch: id 20 within 1 bit of the index
    // (→ drop), ids 21/22 within 1 bit of each other (→ keeper 21),
    // id 23 far from everything (→ keeper)
    val index = Seq(0xF0L).toDF("h")
    val batch = Seq(
      (20L, 0xF1L),                  // hamming 1 from indexed 0xF0 → drop
      (21L, 0x0FF0000000000000L),    // keeper of the 21/22 pair
      (22L, 0x0FF0000000000001L),    // hamming 1 from 21 → drop
      (23L, 0x00000FFFF0000000L)     // far singleton → keeper
    ).toDF("doc_id", "dhash")
    val got = Dedup.dedupIncrementalHamming(batch, "doc_id", "dhash", index, "h", 3)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(21L, 23L), s"got $got")
    // collision-heavy bloom: popcount verify must carry the result alone
    val tiny = Dedup.dedupIncrementalHamming(batch, "doc_id", "dhash", index, "h", 3,
      expectedItems = 2L, numBits = 64L)
      .select("doc_id").as[Long].collect().toSet
    assert(tiny == Set(21L, 23L), s"tiny-bloom got $tiny")
    // empty index: within-batch dedup only
    val noIdx = Dedup.dedupIncrementalHamming(batch, "doc_id", "dhash",
      index.filter(lit(false)), "h", 3)
      .select("doc_id").as[Long].collect().toSet
    assert(noIdx == Set(20L, 21L, 23L), s"empty-index got $noIdx")
    // boundary: exactly maxHamming from the index drops; a far row
    // (distant from both the index and row 30) survives
    val edge = Seq((30L, 0xF0L ^ 7L), (31L, 0x0F0F0F0F00000000L))
      .toDF("doc_id", "dhash")
    val got2 = Dedup.dedupIncrementalHamming(edge, "doc_id", "dhash", index, "h", 3)
      .select("doc_id").as[Long].collect().toSet
    assert(got2 == Set(31L), s"boundary got $got2")
  }

  test("decontaminateNgrams: 13-token overlap drops, 12-token overlap survives") {
    val evalDoc = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike"
    val thirteen = evalDoc // exactly the 13 shared tokens
    val corpus = Seq(
      (1L, s"intro words here $thirteen trailing content"),          // full 13-gram → drop
      (2L, s"unrelated start ${thirteen.split(' ').take(12).mkString(" ")} suffix"), // only 12 → keep
      (3L, "completely different text with no overlap at all whatsoever in any window")
    ).toDF("doc_id", "text")
    val bl = Seq(evalDoc).toDF("text")
    val kept = Dedup.decontaminateNgrams(corpus, "doc_id", "text", bl, "text", n = 13)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L), s"got $kept")
  }

  test("decontaminateNgrams: xxhash64 production path == md5 oracle path") {
    // the q85 oracle replays md5 grams while the benched Spark side runs
    // xxhash64 grams — valid only because the kept-id set is hash-family-
    // invariant. Assert that on the real documents table (gate slice).
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bl = docs.filter(col("doc_id") % 10 === 0)
    val prod = Dedup.decontaminateNgrams(docs, "doc_id", "text", bl, "text", n = 13)
      .select("doc_id")
    val oracleFam = Dedup.decontaminateNgrams(docs, "doc_id", "text", bl, "text",
      n = 13, md5Grams = true).select("doc_id")
    assertSameRows(prod, oracleFam, "gram hash family must not change the kept set")
  }

  test("deterministicSample is reproducible and roughly proportional") {
    val df = (0L until 1000L).toDF("doc_id")
    val a = Dedup.deterministicSample(df, "doc_id", 25).as[Long].collect().toSet
    val b = Dedup.deterministicSample(df.repartition(7), "doc_id", 25)
      .as[Long].collect().toSet
    assert(a == b, "sample must not depend on partitioning")
    assert(a.size > 150 && a.size < 350, s"~25% expected, got ${a.size}")
  }

  test("jaccard brute pairs: hand-computed value") {
    val tiny = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    // 2-shingles: {a b, b c, c d} vs {a b, b c, c e} → 2/4 = 0.5
    val j = Dedup.jaccardPairsBrute(tiny, "doc_id", "text", shingleSize = 2)
      .select("jaccard").as[Double].head()
    assert(math.abs(j - 0.5) < 1e-12)
  }

  test("chunk dedup: hand-computed duplicated-chunk counts") {
    // chunkTokens=2 → doc 1: [a b][c d], doc 2: [a b][x y], doc 3:
    // [c d][a b][z] — "a b" keeper is (1,0), "c d" keeper is (1,1),
    // so doc 1 has 0 dups, doc 2 has 1 ("a b"), doc 3 has 2.
    val tiny = Seq(
      (1L, "a b c d"), (2L, "a b x y"), (3L, "c d a b z")
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDupStats(tiny, "doc_id", "text", chunkTokens = 2)
      .select("doc_id", "n_chunks", "n_dup")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(1L) == (2L, 0L))
    assert(out(2L) == (2L, 1L))
    assert(out(3L) == (3L, 2L))
  }

  test("fuzzy decontamination: near-dups of blocklist dropped, unrelated kept") {
    // blocklist = baseText; corpus: doc 2 is a 1-word-in-20 edit
    // (3-shingle jaccard ≈ 0.74 ≥ 0.5 → dropped), doc 4 unrelated
    // (kept), doc 7 an exact copy (jaccard 1 → dropped), doc 8 a
    // half-overlap rewrite below threshold (kept).
    val block = Seq((100L, baseText)).toDF("bid", "btext")
    val corpus = Seq(
      (2L, baseText.replace("kappa", "kilo")),
      (4L, "totally different content about spark engines and scale"),
      (7L, baseText),
      (8L, "alpha beta gamma completely new words follow here now " +
        "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminateFuzzy(
      corpus, "doc_id", "text", block, "btext",
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(4L, 8L))
    // the blocklist side must reach the banding join as a broadcast —
    // the corpus text never crosses an exchange
    val plan = Dedup.decontaminateFuzzy(
      corpus, "doc_id", "text", block, "btext").queryExecution
      .executedPlan.toString
    assert(plan.contains("BroadcastExchange"), s"blocklist must broadcast:\n$plan")
  }

  test("chunk scrub: cross-doc duplicated chunks removed from every doc") {
    // chunkTokens=2 → doc 1: [a b][c d], doc 2: [a b][x y], doc 3:
    // [c d][a b][z]. "a b" in docs {1,2,3}, "c d" in {1,3} → both
    // banned (≥2 docs); "x y", "z" unique → kept.
    val tiny = Seq(
      (1L, "a b c d"), (2L, "a b x y"), (3L, "c d a b z")
    ).toDF("doc_id", "text")
    val out = Dedup.chunkScrub(tiny, "doc_id", "text", chunkTokens = 2)
      .select("doc_id", "text_scrubbed", "n_chunks", "n_removed")
      .as[(Long, String, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(out(1L) == (("", 2L, 2L)))
    assert(out(2L) == (("x y", 2L, 1L)))
    assert(out(3L) == (("z", 3L, 2L)))
  }

  test("exactSubstrSpans catches the boundary-straddling duplicate chunkScrub misses") {
    // The r16 verdict's planted case: a 16-token copy placed at
    // DIFFERENT offsets in two docs. chunkScrub's fixed 8-token grid
    // splits the copy differently in each doc (offsets 5 and 9 → grid
    // phases 5 and 1), so no grid chunk is shared and NOTHING is
    // scrubbed; the all-alignment window join flags the exact span in
    // both docs.
    val shared = (0 until 16).map(i => s"dup$i")
    val docA = ((0 until 5).map(i => s"a$i") ++ shared ++
      (0 until 7).map(i => s"atail$i")).mkString(" ")
    val docB = ((0 until 9).map(i => s"b$i") ++ shared ++
      (0 until 3).map(i => s"btail$i")).mkString(" ")
    val docs = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    // q197's pass at its 8-token grid: zero chunks banned
    val scrub = Dedup.chunkScrub(docs, "doc_id", "text", chunkTokens = 8)
      .select("doc_id", "n_removed").as[(Long, Long)].collect().toMap
    assert(scrub(1L) == 0L && scrub(2L) == 0L,
      s"fixture must defeat the grid pass: $scrub")
    // ... and the per-position window join reports the exact 16-token
    // span at each doc's own offset (1-based token coordinates)
    val spans = Dedup.exactSubstrSpans(docs, "doc_id", "text", window = 16)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(spans(1L) == ((6L, 16L, 1L)), s"doc A span: $spans")
    assert(spans(2L) == ((10L, 16L, 1L)), s"doc B span: $spans")
  }

  test("exactSubstrScrub cuts the straddling duplicate from every doc but the keeper") {
    // Same planted corpus as the spans test: chunkScrub's 8-token grid
    // removes NOTHING (asserted there), so the grid-based curation
    // export ships the 16-token copy twice. The scrub's keep-one-copy
    // census (keeper = min doc id per window hash) keeps doc 1's copy
    // verbatim and cuts doc 2's at its own offset.
    val shared = (0 until 16).map(i => s"dup$i")
    val aToks = (0 until 5).map(i => s"a$i") ++ shared ++
      (0 until 7).map(i => s"atail$i")
    val bToks = (0 until 9).map(i => s"b$i") ++ shared ++
      (0 until 3).map(i => s"btail$i")
    val docs = Seq((1L, aToks.mkString(" ")), (2L, bToks.mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.exactSubstrScrub(docs, "doc_id", "text", window = 16)
      .select("doc_id", "text_scrubbed", "n_tokens", "n_removed")
      .as[(Long, String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(out(1L) == ((aToks.mkString(" "), 28L, 0L)), s"keeper: ${out(1L)}")
    assert(out(2L) == ((
      ((0 until 9).map(i => s"b$i") ++ (0 until 3).map(i => s"btail$i"))
        .mkString(" "), 28L, 16L)), s"non-keeper: ${out(2L)}")
    // three-way: the min doc keeps, BOTH others are cut; a doc shorter
    // than the window passes through untouched; partition-invariant
    val docs3 = Seq(
      (5L, (Seq("c1") ++ shared).mkString(" ")),
      (3L, aToks.mkString(" ")),
      (9L, bToks.mkString(" ")),
      (7L, "tiny doc")).toDF("doc_id", "text").repartition(7)
    val out3 = Dedup.exactSubstrScrub(docs3, "doc_id", "text", window = 16)
      .select("doc_id", "n_removed").as[(Long, Long)].collect().toMap
    assert(out3 == Map(3L -> 0L, 5L -> 16L, 9L -> 16L, 7L -> 0L), s"got $out3")
  }

  test("exactSubstrScrubAll cuts within-doc repeats too, keeping the first occurrence") {
    val shared = (0 until 16).map(i => s"dup$i")
    val own = (0 until 16).map(i => s"own$i")
    val docs = Seq(
      (1L, ((0 until 5).map(i => s"a$i") ++ shared).mkString(" ")),
      (2L, (shared ++ (0 until 3).map(i => s"b$i")).mkString(" ")),
      (3L, (own ++ own).mkString(" ")), // repeats its OWN phrase
      (7L, "tiny doc")).toDF("doc_id", "text")
    val out = Dedup.exactSubstrScrubAll(docs, "doc_id", "text", window = 16)
      .select("doc_id", "text_scrubbed", "n_tokens", "n_removed")
      .as[(Long, String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // cross-doc: first occurrence is (doc 1, p 6) → doc 1 intact
    assert(out(1L)._3 == 0L && out(1L)._1.endsWith(shared.mkString(" ")),
      s"first-occurrence doc intact: ${out(1L)}")
    assert(out(2L) == (((0 until 3).map(i => s"b$i").mkString(" "), 19L, 16L)),
      s"cross-doc later occurrence cut: ${out(2L)}")
    // within-doc: the q214 census cannot see this (one distinct doc);
    // the unified census cuts the second copy, keeps the first
    assert(out(3L) == ((own.mkString(" "), 32L, 16L)),
      s"within-doc repeat cut: ${out(3L)}")
    assert(out(7L)._3 == 0L, s"short doc passes: ${out(7L)}")
    // q214 on the same corpus ships doc 3's repeat twice — the exact
    // residual q215 exists to close
    val crossOnly = Dedup.exactSubstrScrub(docs, "doc_id", "text", window = 16)
      .select("doc_id", "n_removed").as[(Long, Long)].collect().toMap
    assert(crossOnly(3L) == 0L,
      s"fixture: the cross-doc census must miss the within-doc repeat: $crossOnly")
    // on a corpus with NO within-doc repeats the two scrubs agree
    val noWithin = docs.filter(col("doc_id") =!= 3L)
    assertSameRows(
      Dedup.exactSubstrScrubAll(noWithin, "doc_id", "text", window = 16),
      Dedup.exactSubstrScrub(noWithin, "doc_id", "text", window = 16),
      "scrubAll == scrub without within-doc repeats")
  }

  test("exactSubstrSpans: runs merge, within-doc repeats don't self-flag, partition-invariant") {
    // 20 shared tokens at window 16 → 5 flagged positions merging into
    // one span of 20 tokens; a doc repeating ITS OWN phrase is not
    // cross-doc and stays clean at minDocs=2
    val shared = (0 until 20).map(i => s"s$i")
    val docs = Seq(
      (1L, (shared ++ Seq("x1", "x2")).mkString(" ")),
      (2L, (Seq("y1") ++ shared).mkString(" ")),
      (3L, ((0 until 16).map(i => s"own$i") ++ (0 until 16).map(i => s"own$i"))
        .mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.exactSubstrSpans(docs, "doc_id", "text", window = 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((1L, 1L, 20L, 5L), (2L, 2L, 20L, 5L)),
      s"merged spans only, no self-flag: $out")
    val re = Dedup.exactSubstrSpans(docs.repartition(13), "doc_id", "text",
        window = 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(re == out, "partitioning must not change spans")
  }

  test("chunk scrub: minDocs above every df is the identity scrub") {
    val tiny = Seq((1L, "a b c d"), (2L, "a b x y")).toDF("doc_id", "text")
    val out = Dedup.chunkScrub(tiny, "doc_id", "text",
        chunkTokens = 2, minDocs = 99)
      .select("doc_id", "text_scrubbed", "n_removed")
      .as[(Long, String, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(1L) == (("a b c d", 0L)))
    assert(out(2L) == (("a b x y", 0L)))
  }

  test("chunk scrub: result is partitioning-invariant") {
    val docs = (0L until 200L).map(i => (i, (s"tok${i % 7} " * 12).trim))
      .toDF("doc_id", "text")
    val a = Dedup.chunkScrub(docs, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().toSet
    val b = Dedup.chunkScrub(docs.repartition(13), "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(a == b)
    assert(a.exists(_._4 > 0), "fixture must contain banned chunks")
  }

  test("chunk scrub invariants on a random corpus: counts add up, text shrinks") {
    val rnd = new scala.util.Random(7)
    val docs = (0L until 120L).map { i =>
      val toks = Seq.fill(4 + rnd.nextInt(30))(s"w${rnd.nextInt(40)}")
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val out = Dedup.chunkScrub(docs, "doc_id", "text", chunkTokens = 3)
      .select("doc_id", "text_scrubbed", "n_chunks", "n_removed")
      .as[(Long, String, Long, Long)].collect()
    assert(out.length == 120)
    val orig = docs.as[(Long, String)].collect().toMap
    out.foreach { case (id, scrubbed, nChunks, nRemoved) =>
      assert(nRemoved >= 0 && nRemoved <= nChunks, s"doc $id counts")
      // survivors are a subsequence of the original token stream
      val o = orig(id).split(" ")
      val s = if (scrubbed.isEmpty) Array.empty[String] else scrubbed.split(" ")
      var oi = 0
      s.foreach { tok =>
        while (oi < o.length && o(oi) != tok) oi += 1
        assert(oi < o.length, s"doc $id: '$tok' not in order in original")
        oi += 1
      }
      // full scrub <=> empty output
      assert((nRemoved == nChunks) == scrubbed.isEmpty, s"doc $id empty-iff")
    }
    // the fixture's 40-token vocabulary guarantees cross-doc repeats
    assert(out.map(_._4).sum > 0, "fixture must ban some chunks")
  }

  test("doc chunk dedup: first occurrence kept in order, zero exchanges") {
    // chunkTokens=2 → doc 1: [a b][c d][a b][e] → [a b][c d][e];
    // doc 2: no repeats → identity.
    val tiny = Seq(
      (1L, "a b c d a b e"), (2L, "p q r s")
    ).toDF("doc_id", "text")
    val deduped = Dedup.docChunkDedup(tiny, "doc_id", "text", chunkTokens = 2)
    val out = deduped
      .select("doc_id", "text_deduped", "n_chunks", "n_dup")
      .as[(Long, String, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(out(1L) == (("a b c d e", 4L, 1L)))
    assert(out(2L) == (("p q r s", 2L, 0L)))
    // map-side contract: the whole operator rides the scan
    val plan = deduped.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"docChunkDedup must not shuffle:\n$plan")
  }

  test("chunk dedup: keeper choice is partitioning-invariant") {
    val docs = (0L until 200L).map(i => (i, (s"tok${i % 7} " * 12).trim))
      .toDF("doc_id", "text")
    val a = Dedup.chunkDupStats(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    val b = Dedup.chunkDupStats(docs.repartition(13), "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
    assert(a.map(_._3).sum > 0, "fixture must contain duplicated chunks")
  }

  test("chunk dedup: aggregate-only plan — no hash-partition window (hot-chunk safe)") {
    // the pre-r14 window-over-chunk-hash form parked a corpus-universal
    // chunk's whole instance set in one window partition; the rewrite
    // must keep the plan window-free so that shape can't regress
    val docs = (0L until 50L).map(i => (i, "same boilerplate chunk here"))
      .toDF("doc_id", "text")
    val out = Dedup.chunkDupStats(docs, "doc_id", "text", chunkTokens = 2)
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "chunkDupStats must stay aggregate-only")
    // every doc dedups against doc 0 under the universal chunk
    val m = out.as[(Long, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    assert(m(0L) == 0L && (1L until 50L).forall(m(_) == 2L))
  }

  /** Direct (non-rolling) reference of the CDC substring-dup definition:
    * per-position window hashes, boundary set, md5-free content
    * multiplicity, run merge — everything the operator computes, written
    * as plain per-doc loops. Guards the rolling-hash recurrence and the
    * window/merge plumbing against the declared spec. */
  private def substringDupsRef(
      docs: Seq[(Long, String)], minLen: Int, w: Int, p: Int)
      : Set[(Long, Long, Long, Long)] = {
    val B = 31L; val M = 1000003L
    val chunks = docs.flatMap { case (id, t) =>
      val codes = t.codePoints().toArray
      val n = codes.length
      val anchors = (1 to n - w).filter { i =>
        var h = 0L
        for (j <- 0 until w) h = (h * B + codes(i + j)) % M
        h % p == 0
      }
      val bounds = (0 +: anchors :+ n).distinct
      bounds.zip(bounds.tail).collect { case (a, b) if b > a =>
        (id, a + 1, b - a, new String(codes, a, b - a))
      }
    }
    val mult = chunks.groupBy(_._4).view.mapValues(_.size).toMap
    docs.map(_._1).flatMap { id =>
      val dup = chunks.filter(c => c._1 == id && mult(c._4) > 1).sortBy(_._2)
      val runs = dup.foldLeft(List.empty[List[(Long, Int, Int, String)]]) {
        case (acc @ (run :: rest), c) if c._2 == run.head._2 + run.head._3 =>
          (c :: run) :: rest
        case (acc, c) => List(c) :: acc
      }
      runs.map { run =>
        val sorted = run.sortBy(_._2)
        (id, sorted.head._2.toLong, sorted.map(_._3).sum.toLong, run.size.toLong)
      }.filter(_._3 >= minLen)
    }.toSet
  }

  test("substringDups == direct per-position reference on a random corpus") {
    // random low-vocab texts + planted cross-doc boilerplate at varying
    // offsets — exercises anchors, multiplicity, run merge, minLen
    val rng = new scala.util.Random(41L)
    val vocab = Vector("key", "row", "scan", "table", "value", "part", "agg",
      "fast", "slow", "merge", "batch", "the", "a")
    // long enough that the CDC interior (minus ~one expected chunk of
    // crop at each edge) clears minLen=80 in essentially every carrier
    val license = "this corpus fragment is released under the synthetic " +
      "commons attribution license version four point zero you may share " +
      "and adapt the material for any purpose provided that appropriate " +
      "credit is given a link to the license is provided and changes are " +
      "indicated see the accompanying terms document for the full text"
    def words(n: Int) = Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    val fixture: Seq[(Long, String)] = (0L until 40L).map { i =>
      val body = words(40 + rng.nextInt(40))
      val t =
        if (i % 3 == 0) words(rng.nextInt(8)) + " " + license + " " + body
        else if (i % 3 == 1) body + " " + license
        else body
      (i, t)
    }
    val got = Dedup.substringDups(fixture.toDF("doc_id", "text"),
        "doc_id", "text", minLen = 80, w = 8, p = 32)
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = substringDupsRef(fixture, minLen = 80, w = 8, p = 32)
    assert(got == want, s"got ${got.size} spans, want ${want.size}:\n" +
      s"extra=${got -- want}\nmissing=${want -- got}")
    // the planted license must be found in docs that carry it
    val flagged = got.map(_._1)
    assert(fixture.count { case (i, _) => i % 3 != 2 && flagged(i) } > 20,
      s"license carriers must report spans: $flagged")
    // stability across input partitionings
    val re = Dedup.substringDups(fixture.toDF("doc_id", "text").repartition(13),
        "doc_id", "text", minLen = 80, w = 8, p = 32)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(re == got)
  }

  test("substringDups plans no global window and never shuffles the text") {
    val q = Dedup.substringDups(docs, "doc_id", "text")
    val global = q.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty, "all windows must be partitioned")
    // the text column must be projected away before any exchange: no
    // Exchange subtree may output the raw string, only the md5 hash.
    // AQE's wrapper hides exchange nodes from tree traversal, so probe
    // a non-adaptive session's physical plan.
    val sc = spark.newSession()
    sc.conf.set("spark.sql.adaptive.enabled", "false")
    import sc.implicits._
    val plain = Dedup.substringDups(
      Seq((0L, baseText), (1L, baseText)).toDF("doc_id", "text"),
      "doc_id", "text")
    val exchanges = plain.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty, "expected the hash and doc-id exchanges")
    exchanges.foreach { e =>
      assert(!e.output.exists(_.name == "_t"),
        s"text must not cross an exchange: ${e.output}")
    }
  }

  test("containmentPairs: full & partial containment, ordering, df cap") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),         // shingles {a b c, b c d}
      (2L, "a b c d e f"),     // ⊇ doc 1's shingles + {c d e, d e f}
      (3L, "x y z w"),         // unrelated
      (4L, "c d e f g")        // shares {c d e, d e f} with doc 2
    ).toDF("doc_id", "text")
    // maxDfShare=2, n=4: shingles with df ≤ 2 survive — here all do
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
        ngram = 3, maxDfShare = 2, minContainmentFp = 30000L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    // doc 1 fully contained in doc 2 (2/2); doc 4 partially (2/3)
    assert(got == Set(
      (1L, 2L, 2L, 2L, 4L, 65536L),
      (4L, 2L, 2L, 3L, 4L, 2L * 65536L / 3L)), s"got $got")
    // a boilerplate shingle shared by all docs must be pruned by the
    // df cap, not pair everything with everything
    val boiler = Seq(
      (1L, "w1 w2 w3 a b c"), (2L, "w1 w2 w3 d e f"),
      (3L, "w1 w2 w3 g h i"), (4L, "w1 w2 w3 j k l"),
      (5L, "w1 w2 w3 m n o")).toDF("doc_id", "text")
    val gotB = Dedup.containmentPairs(boiler, "doc_id", "text",
        ngram = 3, maxDfShare = 2, minContainmentFp = 1L)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // "w1 w2 w3" has df=5 > 5/2 — pruned; remaining shingles unique →
    // no candidate pairs at all
    assert(gotB.isEmpty, s"df cap failed: ${gotB.toSeq}")
    // the ABSOLUTE df cap prunes independently of the share cap: with
    // the share cap loose (maxDfShare=1 → df ≤ 4 all pass) the doc-2
    // shared shingles (df=2,3) survive maxDfAbs=3 but are cut at 1
    val gotAbs = Dedup.containmentPairs(docs, "doc_id", "text",
        ngram = 3, maxDfShare = 1, minContainmentFp = 1L, maxDfAbs = 1)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(gotAbs.isEmpty, s"absolute df cap failed: ${gotAbs.toSeq}")
    val gotAbs3 = Dedup.containmentPairs(docs, "doc_id", "text",
        ngram = 3, maxDfShare = 1, minContainmentFp = 30000L, maxDfAbs = 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(gotAbs3.nonEmpty, s"cap 3 must keep df<=3 shingles")
  }

  test("containmentPairs: packed and struct pair tiers agree") {
    import spark.implicits._
    // rich-ish overlap structure so every code path sees real pairs
    val base = Seq(
      (1L, "a b c d"), (2L, "a b c d e f"), (3L, "x y z w"),
      (4L, "c d e f g"), (5L, "a b c d e f g h"), (6L, "d e f g h i"),
      (7L, "p q r s t"), (8L, "q r s t u v")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.containmentPairs(df, "doc_id", "text", ngram = 3,
          maxDfShare = 2, minContainmentFp = 1000L)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    // ids in [0, 2^31) → the packed-long pair tier
    val packed = run(base)
    // ids beyond 2^31 (the sf1 layout: doc_id up to ~2^37) → the
    // canonical struct tier; output must be identical modulo the shift
    val shift = 1L << 33
    val wide = base.select((col("doc_id") + shift).as("doc_id"), col("text"))
    val struct = run(wide)
    def unshift(s: Set[(Long, Long, Long, Long, Long, Long)]) =
      s.map { case (i, o, n, si, so, c) => (i - shift, o - shift, n, si, so, c) }
    assert(packed.nonEmpty, "fixture must produce pairs")
    assert(unshift(struct) == packed,
      s"struct tier diverged: ${unshift(struct)} vs $packed")
  }

  test("pair operators leave zero persistent RDDs behind (cache-lifetime contract)") {
    // the r13 leak: minhashCandidatePairs' md5-family branch persisted a
    // corpus-sized array<long> frame with no unpersist hook — every call
    // in a long-lived session retained a corpus of cache. The r14
    // contract (header scaladoc): pair-grain results are materialized
    // eagerly and EVERY internal cache is freed before returning, so
    // repeated per-epoch invocations accumulate nothing.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // md5 shingle family, full keeper election consumed (the q91 path)
    Dedup.minhashLsh(docs, "doc_id", "text", shingleSize = 3,
      numHashes = 32, bands = 8, threshold = 0.5,
      shingleHasher = T.md5ShingleHashes).collect()
    // default family (the q38 path)
    Dedup.minhashCandidatePairs(docs, "doc_id", "text", threshold = 0.5).collect()
    // hamming family (q37/q152: sims persist) and containment
    // (q182: postings persists)
    Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3).collect()
    Dedup.containmentPairs(docs, "doc_id", "text", ngram = 3,
      maxDfShare = 2, minContainmentFp = 100L).collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked persistent RDD ids: $leaked")
  }
}
