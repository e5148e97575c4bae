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
}
