package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick quick fox"),
    (2L, "lazy lazy lazy dog dog"),
    (3L, "a completely unrelated document about sparks"),
    (4L, "fox")).toDF("doc_id", "text")

  test("postings: one row per (token, doc) with term frequency") {
    val p = Search.postings(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect()
      .map { case (t, d, tf) => (t, d) -> tf }.toMap
    assert(p(("the", 0L)) == 2 && p(("quick", 1L)) == 2 && p(("lazy", 2L)) == 3)
    assert(p(("fox", 4L)) == 1)
    assert(!p.contains(("quick", 2L)))
  }

  test("indexStats: df/cf/max_tf at vocabulary grain") {
    val st = Search.indexStats(docs, "doc_id", "text")
      .as[(String, Long, Long, Long)].collect()
      .map { case (t, df, cf, mx) => t -> (df, cf, mx) }.toMap
    assert(st("fox") == ((3L, 3L, 1L)))
    assert(st("lazy") == ((2L, 4L, 3L)))
    assert(st("the") == ((2L, 3L, 2L)))
  }

  test("log2FpExpr is the exact integer construction") {
    val got = spark.range(1, 5000)
      .selectExpr("id", Search.log2FpExpr("id") + " AS fp")
      .as[(Long, Long)].collect()
    for ((x, fp) <- got) {
      val msb = 63 - java.lang.Long.numberOfLeadingZeros(x)
      val want = msb * 65536L + ((x - (1L << msb)) * 65536L) / (1L << msb)
      assert(fp == want, s"x=$x")
      // within the linear-fraction's analytic worst case of true log2:
      // max |log2(1+f) - f| = 1 - (1 + ln ln 2)/ln 2 ≈ 0.0861
      assert(math.abs(fp / 65536.0 - math.log(x.toDouble) / math.log(2)) < 0.0862)
    }
  }

  test("mergeIndexStats: any disjoint split merges back to the full dictionary") {
    val full = Search.indexStats(docs, "doc_id", "text")
      .as[(String, Long, Long, Long)].collect().toSet
    for (mod <- Seq(2L, 3L)) {
      val a = Search.indexStats(docs.filter(col("doc_id") % mod === 0), "doc_id", "text")
      val b = Search.indexStats(docs.filter(col("doc_id") % mod =!= 0), "doc_id", "text")
      val merged = Search.mergeIndexStats(a, b)
        .as[(String, Long, Long, Long)].collect().toSet
      assert(merged == full, s"mod=$mod")
    }
    // three-way fold (base + two nightly deltas) also converges
    val parts = (0L until 3L).map(r =>
      Search.indexStats(docs.filter(col("doc_id") % 3 === r), "doc_id", "text"))
    val folded = parts.reduce(Search.mergeIndexStats)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(folded == full)
  }

  test("positionalPostings: 0-based (token, doc, pos) rows") {
    val p = Search.positionalPostings(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect().toSet
    assert(p.contains(("the", 0L, 0L)) && p.contains(("quick", 0L, 1L)))
    assert(p.contains(("the", 0L, 6L)) && p.contains(("dog", 0L, 8L)))
    assert(p.contains(("fox", 4L, 0L)))
    // empty-token docs produce nothing; doc 4 has exactly one posting
    assert(p.count(_._2 == 4L) == 1)
  }

  test("phraseHits: occurrences, repeated-term phrases, overlap, and ranks") {
    val pdocs = Seq(
      (0L, "a b a b a"),   // "a b" at 0 and 2; "a a" nowhere; "b a b" at 1
      (1L, "a a a"),       // "a a" at 0 AND 1 (overlapping occurrences)
      (2L, "b b"),
      (3L, "a b")).toDF("doc_id", "text")
    val phrases = Seq(
      (0, 0, "a"), (0, 1, "b"),           // bigram
      (1, 0, "a"), (1, 1, "a"),           // repeated term
      (2, 0, "b"), (2, 1, "a"), (2, 2, "b")) // trigram
      .toDF("phrase_id", "idx", "term")
    val got = Search.phraseHits(pdocs, "doc_id", "text", phrases)
      .as[(Int, Long, Long, Long)].collect()
      .map { case (p, d, n, f) => (p, d) -> (n, f) }.toMap
    assert(got((0, 0L)) == ((2L, 0L)))   // "a b" twice in doc 0, first at 0
    assert(got((0, 3L)) == ((1L, 0L)))
    assert(!got.contains((0, 1L)) && !got.contains((0, 2L)))
    assert(got((1, 1L)) == ((2L, 0L)))   // overlapping "a a" both count
    assert(!got.contains((1, 0L)))        // "a b a b a" has no adjacent a a
    assert(got((2, 0L)) == ((1L, 1L)))   // "b a b" once, start 1
    assert(!got.contains((2, 2L)))        // "b b" lacks the middle a
  }

  test("proximityHits: windowed pair counts and min distance") {
    val pdocs = Seq(
      (0L, "x q q q y"),   // x..y distance 4
      (1L, "x y"),          // distance 1
      (2L, "x q q q q q y"), // distance 6 — outside window
      (3L, "y q x q y")).toDF("doc_id", "text") // two pairs: d2 and d2
    val pairs = Seq((0, "x", "y")).toDF("pair_id", "term_a", "term_b")
    val got = Search.proximityHits(pdocs, "doc_id", "text", pairs, window = 4)
      .as[(Int, Long, Long, Long)].collect()
      .map { case (p, d, n, m) => (p, d) -> (n, m) }.toMap
    assert(got((0, 0L)) == ((1L, 4L)))
    assert(got((0, 1L)) == ((1L, 1L)))
    assert(!got.contains((0, 2L)))
    assert(got((0, 3L)) == ((2L, 2L)))   // x at 2 pairs with y at 0 and y at 4
  }

  test("qlTopK matches a scalar replay; OOV terms drop from |q|") {
    val queries = Seq((0, "fox"), (0, "quick"), (0, "zzzunseen"), (1, "lazy"))
      .toDF("query_id", "term")
    val mu = 50L
    val got = Search.qlTopK(docs, "doc_id", "text", queries, k = 10, mu = mu)
      .select("query_id", "doc_id", "score_fp", "rk")
      .as[(Int, Long, Long, Int)].collect()
      .map { case (q, d, s, r) => (q, d) -> (s, r) }.toMap

    val texts = Map(0L -> "the quick brown fox jumps over the lazy dog",
      1L -> "the quick quick fox", 2L -> "lazy lazy lazy dog dog",
      3L -> "a completely unrelated document about sparks", 4L -> "fox")
    val toks = texts.view.mapValues(_.split(" ").toSeq).toMap
    val l = toks.values.map(_.size).sum.toLong
    def log2Fp(x: Long): Long = {
      val msb = 63 - java.lang.Long.numberOfLeadingZeros(x)
      msb * 65536L + ((x - (1L << msb)) * 65536L) / (1L << msb)
    }
    def cf(t: String): Long = toks.values.map(_.count(_ == t)).sum.toLong
    def score(qterms: Seq[String], d: Long): Long = {
      val inVocab = qterms.filter(cf(_) > 0)
      val dlen = toks(d).size.toLong
      val m = inVocab.map { t =>
        val tf = toks(d).count(_ == t).toLong
        if (tf == 0) 0L
        else log2Fp(mu * cf(t) + tf * l) - log2Fp(mu * cf(t))
      }.sum
      m + inVocab.size * (log2Fp(mu) - log2Fp(dlen + mu))
    }
    for (((q, d), (s, _)) <- got) {
      val qterms = if (q == 0) Seq("fox", "quick", "zzzunseen") else Seq("lazy")
      assert(s == score(qterms, d), s"query $q doc $d")
    }
    // the OOV term must not change ranking vs the 2-term query
    val noOov = Search.qlTopK(docs, "doc_id", "text",
        Seq((0, "fox"), (0, "quick")).toDF("query_id", "term"), k = 10, mu = mu)
      .select("query_id", "doc_id", "score_fp")
      .as[(Int, Long, Long)].collect().toSet
    assert(noOov == got.collect { case ((0, d), (s, _)) => (0, d, s) }.toSet)
    // relevance sanity: doc 1 ("the quick quick fox") matches BOTH
    // terms in 4 tokens — it outranks the single-term docs
    assert(got((0, 1L))._2 == 1)
    assert(got.contains((0, 4L)))
    // doc 3 matches nothing: absent
    assert(!got.contains((0, 3L)) && !got.contains((1, 3L)))
  }

  test("bm25TopK matches a scalar brute-force replay, ranks relevance sanely") {
    val queries = Seq((0, "fox"), (0, "quick"), (1, "lazy")).toDF("query_id", "term")
    val got = Search.bm25TopK(docs, "doc_id", "text", queries, k = 10)
      .select("query_id", "doc_id", "score_fp", "rk")
      .as[(Int, Long, Long, Int)].collect()
      .map { case (q, d, s, r) => (q, d) -> (s, r) }.toMap

    // scalar replay of the documented fixed-point formula
    val texts = Map(0L -> "the quick brown fox jumps over the lazy dog",
      1L -> "the quick quick fox", 2L -> "lazy lazy lazy dog dog",
      3L -> "a completely unrelated document about sparks", 4L -> "fox")
    val toks = texts.view.mapValues(_.split(" ").toSeq).toMap
    val n = texts.size.toLong
    val l = toks.values.map(_.size).sum.toLong
    def log2Fp(x: Long): Long = {
      val msb = 63 - java.lang.Long.numberOfLeadingZeros(x)
      msb * 65536L + ((x - (1L << msb)) * 65536L) / (1L << msb)
    }
    def score(qterms: Seq[String], d: Long): Long = qterms.map { t =>
      val tf = toks(d).count(_ == t).toLong
      if (tf == 0) 0L
      else {
        val df = toks.values.count(_.contains(t)).toLong
        val dl = toks(d).size.toLong
        val idf = log2Fp(2 * n + 2) - log2Fp(2 * df + 1)
        idf * (tf * 22 * l) / (10 * l * tf + 3 * l + 9 * dl * n)
      }
    }.sum
    for (((q, d), (s, _)) <- got) {
      val qterms = if (q == 0) Seq("fox", "quick") else Seq("lazy")
      assert(s == score(qterms, d), s"query $q doc $d")
    }
    // relevance sanity: doc 1 (quick×2 + fox, short) outranks doc 0
    assert(got((0, 1L))._2 < got((0, 0L))._2)
    // doc 3 contains no query terms: absent from results
    assert(!got.contains((0, 3L)) && !got.contains((1, 3L)))
    // query 1: only doc 2 and doc 0 contain "lazy"; doc 2 wins on tf
    assert(got((1, 2L))._2 == 1 && got((1, 0L))._2 == 2)
  }

  test("rankingMetrics: closed-form MRR/nDCG on a hand-built ranking") {
    // query 0: ranked docs 10,11,12 with rel 1,3,(none) — the ideal
    // order is rel 3 first, so DCG < IDCG and the first rel≥2 hit is
    // at position 2; query 1: perfect ranking → nDCG = 65536 exactly
    val ranked = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L),
      (1L, 20L, 1L), (1L, 21L, 2L)).toDF("query_id", "doc_id", "rk")
    val qrels = Seq((0L, 10L, 1L), (0L, 11L, 3L), (0L, 13L, 2L),
      (1L, 20L, 2L), (1L, 21L, 1L)).toDF("query_id", "doc_id", "rel")
    val got = Search.rankingMetrics(ranked, qrels, k = 3, mrrMinRel = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (q, mrr, dcg, idcg, ndcg) => q -> ((mrr, dcg, idcg, ndcg)) }
      .toMap
    def log2Fp(x: Long): Long = {
      val msb = 63 - java.lang.Long.numberOfLeadingZeros(x)
      msb * 65536L + ((x - (1L << msb)) * 65536L) / (1L << msb)
    }
    def g(rel: Long, pos: Long): Long = ((1L << rel) - 1) * 4294967296L / log2Fp(pos + 1)
    // query 0 DCG: rel 1 at pos 1, rel 3 at pos 2, unjudged at pos 3;
    // ideal: rel 3,2,1 at pos 1,2,3 (doc 13 is relevant but unranked)
    val dcg0 = g(1, 1) + g(3, 2)
    val idcg0 = g(3, 1) + g(2, 2) + g(1, 3)
    assert(got(0L) == ((65536L / 2, dcg0, idcg0, dcg0 * 65536 / idcg0)))
    // query 1: ranking == ideal → nDCG exactly 1.0 in fixed point
    val dcg1 = g(2, 1) + g(1, 2)
    assert(got(1L) == ((65536L, dcg1, dcg1, 65536L)))
  }
}
