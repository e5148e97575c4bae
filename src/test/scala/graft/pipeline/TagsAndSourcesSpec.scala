package graft.pipeline

import graft.SparkSpec
import graft.sources.CsvSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class TagsAndSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("withTags: comma string → trimmed non-empty array") {
    val pin = Seq(
      (1L, "art, ideas ,inspo"),
      (2L, ""),
      (3L, "a,,b, ")).toDF("ind", "tag_list")
    val got = PinQueries.withTags(pin).select("ind", "tags")
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq("art", "ideas", "inspo"))
    assert(got(2L) == Seq.empty)
    assert(got(3L) == Seq("a", "b"))
  }

  test("topTagsPerCategory ranks exploded tag counts with ties kept") {
    val pin = Seq(
      (1L, "x,y", "art"), (2L, "x", "art"), (3L, "y,z", "art"),
      (4L, "q", "diy")).toDF("ind", "tag_list", "category")
    val got = PinQueries.topTagsPerCategory(pin, 1)
      .select("category", "tag", "tag_count")
      .as[(String, String, Long)].collect().toSet
    // art: x=2, y=2 (tie kept at rank 1 via rank()), z=1; diy: q=1
    assert(got == Set(("art", "x", 2L), ("art", "y", 2L), ("diy", "q", 1L)))
  }

  test("CSV source: explicit schema and inferred header forms") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv")
    val f = dir.resolve("creds.csv")
    java.nio.file.Files.writeString(f,
      "User name,Access key,Secret key\ndatabricks-user,AKX,SEC\nother,AKY,SE2\n")
    val schema = StructType(Seq(
      StructField("User name", StringType),
      StructField("Access key", StringType),
      StructField("Secret key", StringType)))
    val explicit = CsvSource.read(spark, f.toString, schema)
    // the reference's P4 scalar-extraction pattern
    val key = explicit.filter(col("User name") === "databricks-user")
      .select("Access key").head().getString(0)
    assert(key == "AKX")
    val inferred = CsvSource.readInferred(spark, f.toString)
    assert(inferred.columns.toSeq == Seq("User name", "Access key", "Secret key"))
    assert(inferred.count() == 2)
  }
}
