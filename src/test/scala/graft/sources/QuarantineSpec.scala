package graft.sources

import graft.SparkSpec
import graft.pipeline.Schemas
import org.apache.spark.sql.functions._

/** Corrupt-input robustness: malformed producer lines are quarantined,
  * not silently dropped or fatal. */
class QuarantineSpec extends SparkSpec {

  test("PERMISSIVE read quarantines malformed lines in _corrupt_record") {
    val dir = java.nio.file.Files.createTempDirectory("graft-quarantine")
    val good = {
      val rng = new scala.util.Random(3L)
      (0 until 20).map(i => EmulatorGenerator.pinJson(rng, i.toLong))
    }
    val bad = Seq(
      """{"index": 99, "unique_id": """, // truncated mid-stream
      """not json at all""",
      """{"index": "NaN-ish", "unique_id": 5}""") // type garbage partially parses
    val p = dir.resolve("topics/pin/partition=0")
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.writeString(p.resolve("000.json"),
      (good ++ bad).mkString("\n"))

    // Spark disallows queries touching ONLY _corrupt_record on a raw
    // JSON scan (the parser would need a second pass) — cache first,
    // as the API contract requires
    val df = JsonSource.readTopicQuarantined(spark, dir.toString, "pin", Schemas.rawPin)
      .cache()
    val quarantined = df.filter(col("_corrupt_record").isNotNull)
    val clean = df.filter(col("_corrupt_record").isNull)
    assert(df.count() == 23)
    // the two structurally-broken lines must be quarantined; the
    // type-garbage line may parse partially (Spark nulls bad fields)
    assert(quarantined.count() >= 2, "broken lines must carry _corrupt_record")
    assert(clean.count() >= 20, "well-formed lines must parse clean")
    // quarantine keeps the raw payload for replay/debugging
    val kept = quarantined.select("_corrupt_record")
      .collect().map(_.getString(0)).toSet
    assert(kept.contains("not json at all"))
  }
}
