package graft.operators

import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("merge keeps highest version per key; update wins version ties") {
    val base = Seq((1L, 5L, "old"), (2L, 3L, "keep"), (3L, 1L, "only-base"))
      .toDF("k", "v", "payload")
    val updates = Seq((1L, 7L, "new"), (2L, 3L, "tied-update"), (4L, 1L, "insert"))
      .toDF("k", "v", "payload")
    val got = Upsert.merge(base, updates, "k", "v")
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 7L, "new"),         // higher version wins
      (2L, 3L, "tied-update"), // tie → update side
      (3L, 1L, "only-base"),   // untouched base row survives
      (4L, 1L, "insert")))     // pure insert
  }

  test("merge output has exactly one row per key") {
    val base = (1 to 100).map(i => (i.toLong % 10, i.toLong, s"b$i")).toDF("k", "v", "p")
    val updates = (1 to 50).map(i => (i.toLong % 7, 200L + i, s"u$i")).toDF("k", "v", "p")
    val merged = Upsert.merge(base, updates, "k", "v")
    assert(merged.groupBy("k").count().filter($"count" > 1).count() == 0)
    assert(merged.count() == 10) // keys 0..9
  }

  test("diff classifies added, removed, changed, unchanged") {
    import org.apache.spark.sql.functions.{col, md5}
    val v1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val v2 = Seq((2L, "beta"), (3L, "gamma prime"), (4L, "delta"))
      .toDF("doc_id", "text")
    val got = Upsert.diff(v1, v2, "doc_id", md5(col("text")))
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
    // round-trip with merge: applying v2's adds+changes onto v1 via
    // merge, then dropping removals, reconstructs v2 exactly
    val delta = Upsert.diff(v1, v2, "doc_id", md5(col("text")))
    val applied = Upsert.merge(
        v1.withColumn("ver", org.apache.spark.sql.functions.lit(1L)),
        v2.join(delta.filter(col("status").isin("added", "changed")),
          Seq("doc_id"), "left_semi")
          .withColumn("ver", org.apache.spark.sql.functions.lit(2L)),
        "doc_id", "ver")
      .join(delta.filter(col("status") === "removed"), Seq("doc_id"), "left_anti")
      .select("doc_id", "text")
    assertSameRows(applied, v2, "diff→merge round-trip")
  }
}
