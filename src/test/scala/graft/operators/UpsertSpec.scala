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
}
