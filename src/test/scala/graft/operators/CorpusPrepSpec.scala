package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The composed corpus-prep chain on planted edge cases: duplicate
  * survives once, junk filtered, contamination removed, quota holds,
  * and Unicode variants of the same text fold together. */
class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  private val prose = "the quick brown fox jumps over the lazy dog again and again"

  test("dedup, quality, decontamination, quota — each observable in the output") {
    val docs = Seq(
      (1L, prose, "en"),
      (2L, prose, "en"),                     // exact duplicate → dropped
      (3L, prose.toUpperCase, "en"),         // case variant → folds to same hash → dropped
      (4L, "x", "en"),                       // too short → quality-filtered
      (5L, "12345 67890 11111 22222 33333 44444", "en"), // digits: alpha ratio fails
      (6L, "a perfectly normal document about cooking rice slowly", "en"),
      (7L, "evaluation question that must not leak into training data", "en"),
      (8L, "café terrace discussion about morning espresso rituals", "fr"),
      (9L, "café terrace discussion about morning espresso rituals", "fr") // NFC fold
    ).toDF("doc_id", "text", "lang")
    val blocklist = Seq(
      "Evaluation question that MUST not leak   into training data")
      .toDF("text") // normalized variant of doc 7
    val out = CorpusPrep.prepare(docs, blocklist, "doc_id", "text", "lang")
      .as[(Long, String, Long)].collect()
      .map { case (id, lang, n) => id -> ((lang, n)) }.toMap

    assert(out.contains(1L) && !out.contains(2L) && !out.contains(3L),
      s"duplicates must collapse to the min id: $out")
    assert(!out.contains(4L) && !out.contains(5L), s"junk must be filtered: $out")
    assert(out.contains(6L))
    assert(!out.contains(7L), s"blocklisted content must be removed: $out")
    assert(out.contains(8L) && !out.contains(9L),
      s"NFC variants must fold to one kept doc: $out")
    assert(out(1L)._2 == 12L, "token count carried through")
  }

  test("per-language quota bounds the output deterministically") {
    val docs = (1L to 400L).map(i =>
      (i, s"unique document number $i with plenty of ordinary words inside it", if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val out = CorpusPrep.prepare(docs, Seq.empty[String].toDF("text"),
      "doc_id", "text", "lang", quotaPerLang = 30)
    val perLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(perLang == Map("en" -> 30L, "de" -> 30L), s"got $perLang")
    // determinism across partitionings
    val out2 = CorpusPrep.prepare(docs.repartition(7), Seq.empty[String].toDF("text"),
      "doc_id", "text", "lang", quotaPerLang = 30)
    assertSameRows(out, out2, "quota selection across partitionings")
  }

  test("quota selection survives full-range ids (negative and >= 2^43)") {
    // the r15 packing removal: ids used to ride packed as id·2^20+ntok,
    // which truncates negative ids toward zero on decode and overflows
    // int64 past 2^43 — both silently. Hash-derived ids (xxhash64
    // content ids are used as doc ids elsewhere in the catalog) hit
    // both regions, so prepare() must keep them bit-exact.
    val ids = Seq(Long.MinValue + 5L, -987654321098765432L, -3L,
      7L, (1L << 43) + 17L, Long.MaxValue - 9L)
    val docs = ids.zipWithIndex.map { case (id, i) =>
      (id, s"unique ordinary document number about topic $i with several plain words", "en")
    }.toDF("doc_id", "text", "lang")
    val out = CorpusPrep.prepare(docs, Seq.empty[String].toDF("text"),
      "doc_id", "text", "lang", quotaPerLang = 100)
      .as[(Long, String, Long)].collect()
    assert(out.map(_._1).toSet == ids.toSet,
      s"ids must round-trip bit-exact, got ${out.map(_._1).toSet}")
    assert(out.forall(_._3 == 11L), s"token counts must survive: ${out.toSeq}")
    // binding quota: selection order is (hashOrder asc, id asc) —
    // computed independently here and compared against the aggregate
    val expected = docs
      .select(col("doc_id"), graft.Exact.hashOrder(col("doc_id"), 97).as("_ho"))
      .as[(Long, Long)].collect().sortBy { case (id, ho) => (ho, id) }
      .take(2).map(_._1).toSet
    val bound = CorpusPrep.prepare(docs, Seq.empty[String].toDF("text"),
      "doc_id", "text", "lang", quotaPerLang = 2)
      .as[(Long, String, Long)].collect().map(_._1).toSet
    assert(bound == expected, s"got $bound, want $expected")
  }

  test("unimaxAllocation: caps bind the tail, the head splits the rest, budget conserved") {
    // total 1000, budget 1/1 → 1000; caps (×2): a=20, b=60, c=1200, d=720
    val stats = Seq(("a", 10L), ("b", 30L), ("c", 600L), ("d", 360L))
      .toDF("lang", "n_g")
    val out = CorpusPrep.unimaxAllocation(stats, "lang", "n_g",
        budgetNum = 1L, budgetDen = 1L, epochsCap = 2)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // waterfilling ascending by cap: a: min(20, 1000/4=250)=20;
    // b: min(60, 980/3=326)=60; d: min(720, 920/2=460)=460;
    // c: min(1200, 460/1)=460
    assert(out("a")._4 == 20L && out("b")._4 == 60L, s"tail at cap: $out")
    assert(out("d")._4 == 460L && out("c")._4 == 460L, s"head splits: $out")
    assert(out.values.map(_._4).sum == 1000L, "budget conserved")
    assert(out("a")._5 == 131072L, "epochs_fp: 2 epochs = 2·65536")
    // slack budget: everything capped, leftover unspent
    val slack = CorpusPrep.unimaxAllocation(stats, "lang", "n_g",
        budgetNum = 10L, budgetDen = 1L, epochsCap = 2)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(slack.forall(r => r._4 == r._3), s"all at cap under slack: ${slack.toSeq}")
    // group-domain bound fails loudly
    val err = intercept[IllegalArgumentException] {
      CorpusPrep.unimaxAllocation(stats, "lang", "n_g", 1L, 1L, 2, maxGroups = 2)
    }
    assert(err.getMessage.contains("maxGroups"))
  }

  test("epochExpand: whole epochs plus a deterministic remainder prefix") {
    val items = Seq(
      ("en", 1L, 100L), ("en", 2L, 100L), ("en", 3L, 100L), ("en", 4L, 100L),
      ("de", 5L, 50L), ("de", 6L, 50L)).toDF("lang", "doc_id", "n")
    // en: n_g=400, alloc 1000 → 2 epochs + 200-token remainder prefix
    // (2 docs in hash order get a 3rd repeat); de: alloc 25 → 0 epochs,
    // remainder covers no full doc (50 > 25) → de drops entirely
    val alloc = Seq(("en", 400L, 1000L), ("de", 100L, 25L))
      .toDF("lang", "corpus_tokens", "alloc_tokens")
    val out = CorpusPrep.epochExpand(items, "lang", "doc_id", "n", alloc)
      .as[(String, Long, Long, Long)].collect()
    assert(out.forall(_._1 == "en"), s"de below one doc must drop: ${out.toSeq}")
    assert(out.length == 4 && out.map(_._4).sorted.toSeq == Seq(2L, 2L, 3L, 3L),
      s"2 whole epochs + 2-doc remainder prefix: ${out.toSeq}")
    // spent mass approaches the allocation from below at doc grain
    val spent = out.map(r => r._3 * r._4).sum
    assert(spent == 1000L, s"remainder spent exactly here: $spent")
    // determinism: the same docs get the extra repeat across partitionings
    val out2 = CorpusPrep.epochExpand(
        items.repartition(7), "lang", "doc_id", "n", alloc)
      .as[(String, Long, Long, Long)].collect()
    assert(out.sortBy(_._2).toSeq == out2.sortBy(_._2).toSeq)
  }

  test("registrableDomain: eTLD+1 across subdomain depth and suffix shape") {
    val cases = Seq(
      ("https://www.site.co.uk/p/1", "site.co.uk"),     // multi-part suffix
      ("https://a.b.site.co.uk/p/2", "site.co.uk"),     // deep subdomain folds
      ("https://site.co.uk/p/3", "site.co.uk"),         // bare registrable
      ("https://site.org.uk/x", "site.org.uk"),         // must NOT equal co.uk twin
      ("https://www.example.com/q?x=1", "example.com"), // plain two-label
      ("https://Example.COM/", "example.com"),          // case folds
      ("https://cdn.eu.shop.com.au/i.png", "shop.com.au"),
      ("https://localhost/admin", "localhost"),         // single label passes through
      ("not a url at all", null)                        // malformed → null
    )
    val got = cases.map(_._1).toDF("url")
      .select(graft.functions.TextFunctions.registrableDomain(col("url")).as("d"))
      .as[String].collect()
    cases.zip(got).foreach { case ((url, want), d) =>
      assert(d == want, s"$url → got $d, want $want")
    }
  }

  test("domainCap: bounded per-domain, equals the window spec, partition-invariant") {
    // Zipfian-ish: domain 'big.com' gets 70% of docs, others split the rest
    val docs = (1L to 300L).map { i =>
      val host =
        if (i % 10 < 7) "www.big.com"
        else if (i % 10 < 9) s"sub$i.mid.co.uk"
        else "tail.org"
      (i, s"https://$host/p/$i")
    }.toDF("doc_id", "url")
    val out = CorpusPrep.domainCap(docs, "url", "doc_id", cap = 15)
    val perDomain = out.groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(perDomain == Map("big.com" -> 15L, "mid.co.uk" -> 15L, "tail.org" -> 15L),
      s"got $perDomain")
    // the kept set must equal the ROW_NUMBER specification
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain"))
      .orderBy(graft.Exact.hashOrder(col("doc_id"), 97), col("doc_id"))
    val spec = docs
      .select(graft.functions.TextFunctions.registrableDomain(col("url")).as("domain"),
        col("doc_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 15)
      .select("domain", "doc_id")
    assertSameRows(out, spec, "TopK cap vs window spec")
    assertSameRows(out, CorpusPrep.domainCap(docs.repartition(7), "url", "doc_id", 15),
      "cap selection across partitionings")
  }

  test("domainSplit: co-assignment per domain, all splits populated, no shuffle") {
    val docs = (1L to 600L).map { i =>
      (i, s"https://${if (i % 2 == 0) "www." else ""}site${i % 40}.co.uk/p/$i")
    }.toDF("doc_id", "url")
    val out = CorpusPrep.domainSplit(docs, "url")
    // leakage rule: every domain maps to exactly one split
    val perDomain = out.groupBy("domain")
      .agg(countDistinct(col("split")).as("n")).filter(col("n") > 1).count()
    assert(perDomain == 0, "a domain must never straddle splits")
    val splits = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(splits.keySet == Set("train", "valid", "test"),
      s"40 domains must hit all three buckets: $splits")
    assert(splits("train") > splits("test"), s"cuts must skew to train: $splits")
    // pure projection: the split assignment plan contains no exchange
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"domainSplit must not shuffle:\n$plan")
  }

  test("dsirWeights matches a scalar replay; target==corpus zeroes all weights") {
    val docs = Seq(
      (0L, "alpha beta gamma", true),
      (1L, "alpha beta beta", true),
      (2L, "delta epsilon zeta eta", false),
      (3L, "alpha delta", false),
      (4L, "beta gamma gamma delta", false)).toDF("doc_id", "text", "tgt")
    val buckets = 16
    val got = CorpusPrep.dsirWeights(docs, "doc_id", "text", col("tgt"),
        buckets = buckets, ngram = 2)
      .as[(Long, Long, Long)].collect()
      .map { case (d, n, w) => d -> (n, w) }.toMap

    // scalar replay of the documented formula
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    def bucket(f: String): Long = java.lang.Long.parseLong(md5hex(f).take(4), 16) % buckets
    def log2Fp(x: Long): Long = {
      val msb = 63 - java.lang.Long.numberOfLeadingZeros(x)
      msb * 65536L + ((x - (1L << msb)) * 65536L) / (1L << msb)
    }
    val texts = Map(0L -> ("alpha beta gamma", true), 1L -> ("alpha beta beta", true),
      2L -> ("delta epsilon zeta eta", false), 3L -> ("alpha delta", false),
      4L -> ("beta gamma gamma delta", false))
    def feats(t: String): Seq[Long] =
      t.split(" ").toSeq.sliding(2).map(_.mkString(" ")).toSeq.map(bucket)
    val all = texts.toSeq.flatMap { case (d, (t, tg)) => feats(t).map(b => (d, tg, b)) }
    val cr = all.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val ct = all.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val crTot = all.size.toLong
    val ctTot = all.count(_._2).toLong
    def lam(b: Long): Long =
      (log2Fp(ct.getOrElse(b, 0L) + 1) - log2Fp(ctTot + buckets)) -
        (log2Fp(cr(b) + 1) - log2Fp(crTot + buckets))
    for ((d, (t, _)) <- texts) {
      val fs = feats(t)
      assert(got(d) == ((fs.size.toLong, fs.map(lam).sum)), s"doc $d")
    }
    // degenerate pin: target == whole corpus → λ ≡ 0 → every weight 0
    val allTgt = CorpusPrep.dsirWeights(docs, "doc_id", "text", lit(true),
        buckets = buckets, ngram = 2)
      .as[(Long, Long, Long)].collect()
    assert(allTgt.forall(_._3 == 0L), s"target==raw must zero weights: ${allTgt.toSeq}")
  }

  test("mergeDsirStats: any disjoint split merges back to the full model") {
    val docs = Seq(
      (0L, "alpha beta gamma", true),
      (1L, "alpha beta beta", true),
      (2L, "delta epsilon zeta eta", false),
      (3L, "alpha delta", false),
      (4L, "beta gamma gamma delta", false)).toDF("doc_id", "text", "tgt")
    def stats(d: org.apache.spark.sql.DataFrame) = CorpusPrep.dsirBucketStats(
      CorpusPrep.dsirFeatures(d, "doc_id", "text", col("tgt"), buckets = 16))
    val full = stats(docs).as[(Long, Long, Long)].collect().toSet
    for (mod <- Seq(2L, 3L)) {
      val merged = CorpusPrep.mergeDsirStats(
          stats(docs.filter(col("doc_id") % mod === 0)),
          stats(docs.filter(col("doc_id") % mod =!= 0)))
        .as[(Long, Long, Long)].collect().toSet
      assert(merged == full, s"mod=$mod")
    }
    // three-way fold converges too (base + two nightly deltas)
    val folded = (0L until 3L).map(r => stats(docs.filter(col("doc_id") % 3 === r)))
      .reduce(CorpusPrep.mergeDsirStats)
      .as[(Long, Long, Long)].collect().toSet
    assert(folded == full)
  }

  test("isqrtSql is the exact integer sqrt") {
    val got = spark.range(0, 20000)
      .selectExpr("id", CorpusPrep.isqrtSql("id") + " AS s")
      .as[(Long, Long)].collect()
    for ((x, s) <- got)
      assert(s * s <= x && (s + 1) * (s + 1) > x, s"x=$x s=$s")
    // and at the top of the documented range (perfect squares & neighbors)
    val big = Seq(2251799813685248L, 4503599627370495L, 1L << 51)
      .flatMap(x => Seq(x - 1, x, x + 1))
    val gotBig = big.toDF("x").selectExpr("x", CorpusPrep.isqrtSql("x") + " AS s")
      .as[(Long, Long)].collect()
    for ((x, s) <- gotBig)
      assert(s * s <= x && (s + 1) * (s + 1) > x, s"x=$x s=$s")
  }

  test("temperatureSample: √-proportional budgets, hash-prefix selection, determinism") {
    // two groups with 16:1 mass ratio → sqrt ratio 4:1
    val items = ((1L to 64L).map(i => ("big", i, 4L)) ++
      (101L to 104L).map(i => ("small", i, 4L))).toDF("grp", "id", "n")
    val out = CorpusPrep.temperatureSample(items, "grp", "id", "n",
      budgetNum = 1L, budgetDen = 2L)
      .as[(String, Long, Long, Long)].collect()
    // replay the budget arithmetic: n_big=256 n_small=16, s=16,4; T=136
    // B_big = 136*16/20 = 108 → 27 docs of 4; B_small = 136*4/20 = 27
    // → all 4 small docs (16 mass) survive
    val byGrp = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byGrp == Map("big" -> 27, "small" -> 4),
      s"expected √-rebalanced prefix sizes, got $byGrp")
    // small group got BOOSTED relative to proportional: 4/4 kept (100%)
    // vs big 27/64 (42%) — the τ=1/2 tail boost
    // cum is the inclusive running mass in hash order: max cum ≤ B_g
    assert(out.filter(_._1 == "big").map(_._4).max <= 108L)
    assert(out.filter(_._1 == "small").map(_._4).max <= 27L)
    // deterministic across partitionings
    val out2 = CorpusPrep.temperatureSample(items.repartition(7), "grp", "id", "n",
      budgetNum = 1L, budgetDen = 2L).as[(String, Long, Long, Long)].collect()
    assert(out.toSet == out2.toSet)
  }

  test("temperatureSample survives 100TB-regime token counts (int64 budget boundary)") {
    // 3 groups × 4 items of 2^58 tokens: n_tot = 3·2^60 ≈ 3.5e18 — the
    // regime where the naive (T·s_g) div s_tot wraps int64 (T ≈ 1.7e18,
    // s_g = 2^30, product ≈ 2^89) and a wrapped-negative budget silently
    // keeps NOTHING. The divide-first decomposition keeps every
    // intermediate in range; closed form here: n_g = 2^60, s_g = 2^30,
    // s_tot = 3·2^30, T = 3·2^59 → b_g = 2^59 = half the group mass →
    // exactly 2 of each group's 4 equal-mass items survive.
    val n = 1L << 58
    val items = (for { (g, gi) <- Seq("a", "b", "c").zipWithIndex; i <- 0 until 4 }
      yield (g, gi * 10L + i, n)).toDF("grp", "id", "n")
    val out = CorpusPrep.temperatureSample(items, "grp", "id", "n",
      budgetNum = 1L, budgetDen = 2L)
      .as[(String, Long, Long, Long)].collect()
    val byGrp = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byGrp == Map("a" -> 2, "b" -> 2, "c" -> 2),
      s"expected 2 survivors per group at the boundary, got $byGrp")
    assert(out.forall(r => r._4 > 0 && r._4 <= (1L << 59)),
      "running mass must stay positive and within the budget")
  }

  test("dsirLambda is total over the bucket domain; unseen buckets score with the smoothed zero-count λ") {
    // model trained on buckets {0, 1} only; the other 6 of 8 buckets are
    // UNSEEN. cr_tot = 8, ct_tot = 3. Closed form for an unseen bucket:
    // λ = (log2fp(0+1) − log2fp(ct_tot+8)) − (log2fp(0+1) − log2fp(cr_tot+8))
    //   = log2fp(16) − log2fp(11) — the add-1-smoothed zero-count value,
    // NOT absence (the pre-r13 inner-join behavior dropped the feature).
    val stats = Seq((0L, 6L, 2L), (1L, 2L, 1L)).toDF("b", "cr", "ct")
    val lam = CorpusPrep.dsirLambda(stats, buckets = 8)
    val lamMap = lam.as[(Long, Long)].collect().toMap
    assert(lamMap.size == 8, s"λ table must cover the whole domain: $lamMap")
    def log2fp(x: Long): Long = {
      val msb = 63 - java.lang.Long.numberOfLeadingZeros(x)
      msb * 65536L + ((x - (1L << msb)) * 65536L) / (1L << msb)
    }
    val expectUnseen = (log2fp(1) - log2fp(3 + 8)) - (log2fp(1) - log2fp(8 + 8))
    for (b <- 2L to 7L)
      assert(lamMap(b) == expectUnseen, s"unseen bucket $b: ${lamMap(b)} != $expectUnseen")
    // scoring a DISJOINT corpus whose features hit only unseen buckets:
    // both features must land in n_feats and weight_fp
    val feats = Seq((100L, false, 5L), (100L, false, 7L)).toDF("doc_id", "_tgt", "b")
    val w = CorpusPrep.dsirScore(feats, lam)
      .as[(Long, Long, Long)].collect().toSeq
    assert(w == Seq((100L, 2L, 2 * expectUnseen)),
      s"disjoint-corpus features must score with the smoothed λ: $w")
  }

  test("dsirLambda fails loudly on a bucket-domain mismatch") {
    // stats built over a 16-bucket domain handed to an 8-bucket λ call:
    // bucket 9 is outside [0, 8) — previously silently dropped from the
    // λ table while still counting in cr_tot/ct_tot
    val stats = Seq((1L, 4L, 1L), (9L, 4L, 1L)).toDF("b", "cr", "ct")
    val e = intercept[Throwable] {
      CorpusPrep.dsirLambda(stats, buckets = 8).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("dsirLambda")),
      s"expected the dsirLambda domain guard, got: ${chain(e)}")
  }

  test("leakageSafeSplit: clusters never straddle the boundary, singletons hash independently") {
    // planted: chain 10-11, 11-12 (one component, root 10); pair 20-21
    // (root 20); singletons 30..59. Sides must be a pure function of
    // the component ROOT, regardless of member ids.
    val docs = ((10L to 12L) ++ (20L to 21L) ++ (30L to 59L)).toDF("doc_id")
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val out = CorpusPrep.leakageSafeSplit(docs, "doc_id", pairs, testPct = 30)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out.size == 35)
    // whole component shares root AND side
    for (id <- 10L to 12L) assert(out(id)._1 == 10L, s"chain root: $out")
    assert(Set(out(10L)._2, out(11L)._2, out(12L)._2).size == 1, s"chain split: $out")
    for (id <- 20L to 21L) assert(out(id) == out(20L), s"pair: $out")
    // singletons: root = self, side = hashOrder(id) < 30
    for (id <- 30L to 59L) {
      assert(out(id)._1 == id)
      val want = if (((id % 1000000007L) * 2654435761L) % 100 < 30) "test" else "train"
      assert(out(id)._2 == want, s"singleton $id side: ${out(id)}")
    }
    // both sides populated at testPct=30 over 33 roots
    assert(out.values.map(_._2).toSet == Set("train", "test"))
  }

  test("leakageSafeSplitIncremental: sticky, adopt, fresh, and quarantine cases") {
    // old snapshot: clusters {1,2} and {5,6} plus singletons 8, 9
    val oldDocs = Seq(1L, 2L, 5L, 6L, 8L, 9L).toDF("doc_id")
    val oldPairs = Seq((1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val assigned0 = CorpusPrep.leakageSafeSplit(oldDocs, "doc_id", oldPairs, testPct = 30)
    val sides0 = assigned0.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // force a bridge between DIFFERENT old sides: pick two old roots with
    // opposite sides from the planted set (hashOrder(1)%100=61 train,
    // hashOrder(5)%100=5 test at testPct=30; assert rather than assume)
    assert(sides0(1L) != sides0(5L), s"planted roots must differ: $sides0")
    // new snapshot adds: 3 (joins {1,2}), 7 (bridges {1,2} and {5,6}),
    // 100/101 (new pair), 102 (new singleton)
    val union = (Seq(1L, 2L, 5L, 6L, 8L, 9L) ++ Seq(3L, 7L, 100L, 101L, 102L)).toDF("doc_id")
    val pairs = Seq((1L, 2L), (5L, 6L), (2L, 3L), (2L, 7L), (6L, 7L), (100L, 101L))
      .toDF("id_a", "id_b")
    val out = CorpusPrep.leakageSafeSplitIncremental(
        assigned0.select(col("doc_id"), col("side")), union, "doc_id", pairs,
        testPct = 30)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getBoolean(3))))
      .toMap
    assert(out.size == 11)
    // STICKY: every old doc keeps its side verbatim, is_new = false,
    // even though 1,2,5,6,7 are now ONE merged component
    for (id <- Seq(1L, 2L, 5L, 6L, 8L, 9L)) {
      assert(out(id)._2 == sides0(id), s"old doc $id moved: ${out(id)} vs ${sides0(id)}")
      assert(!out(id)._3)
    }
    assert(Seq(3L, 7L, 100L, 101L, 102L).forall(out(_)._3))
    // BRIDGE: 7 connects both old sides -> quarantined; 3 joined the
    // merged component too, which now touches both sides -> quarantined
    assert(out(7L)._2 == "quarantined", s"bridge: ${out(7L)}")
    assert(out(3L)._2 == "quarantined", s"member of bridged component: ${out(3L)}")
    // FRESH: {100,101} all-new component -> hash of root 100 decides both
    assert(out(100L)._2 == out(101L)._2)
    assert(Set("train", "test").contains(out(100L)._2))
    val want100 = if (((100L % 1000000007L) * 2654435761L) % 100 < 30) "test" else "train"
    assert(out(100L)._2 == want100)
    assert(out(102L)._1 == 102L && Set("train", "test").contains(out(102L)._2))
  }

  test("leakageSafeSplitIncremental: chained use — quarantine poisons its component's census") {
    // An earlier epoch quarantined doc 3 (it bridged both sides); its
    // bridge neighbors were since dropped from the corpus (retention),
    // so the next snapshot's union is {3, 4} with the one observed
    // pair (3,4). Doc 4 is transitively in near-dup reach of BOTH old
    // sides through 3 — it must quarantine, not take a fresh hash
    // side (r16 advice; the streaming twin splitIndexBatch already
    // poisoned this way, so this also restores stream==batch parity
    // on chained state).
    val assigned = Seq((3L, "quarantined")).toDF("doc_id", "side")
    val docs = Seq(3L, 4L).toDF("doc_id")
    val pairs = Seq((3L, 4L)).toDF("id_a", "id_b")
    val out = CorpusPrep.leakageSafeSplitIncremental(assigned, docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getBoolean(3)))).toMap
    assert(out(3L) == (("quarantined", false)), s"sticky quarantine: $out")
    assert(out(4L) == (("quarantined", true)), s"poisoned successor: $out")
  }
}
