package graft.queries

import graft.QuerySpec
import graft.pipeline.{Clean, PinQueries}
import graft.sources.{EmulatorGenerator, JsonSource}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reference-parity pipeline surfaced through the driver's correctness
  * gate: deterministic fixture JSON (seeded emulator output, landed-
  * topic layout) → explicit-schema JSON scan → cleaning → Tasks 4–11.
  *
  * These queries don't read the sfDir tables, so they carry no DuckDB
  * oracle (rows-only check); their value semantics are asserted in
  * ScalaTest (CleanSpec / PinTasksSpec) including SQL-vs-DataFrame
  * plan-independent equality.
  */
object PipelineParity {

  private val FixtureRows = 400

  /** Fixture dir is generated once per JVM (seeded → idempotent). */
  @volatile private var fixtureDir: String = _

  private def ensureFixtures(): String = synchronized {
    if (fixtureDir == null) {
      val dir = java.nio.file.Files.createTempDirectory("graft-pipeline-fixtures")
      EmulatorGenerator.writeTopicLayout(dir, FixtureRows, seed = 42L)
      fixtureDir = dir.toString
    }
    fixtureDir
  }

  /** Cleaned frames are built once per session and persisted: all eight
    * task queries reuse them, so the JSON scan + cleaning chain runs
    * once, not 8× (keyed by session so Verify/Bench/driver sessions
    * don't share stale plans). */
  private val cache =
    scala.collection.concurrent.TrieMap.empty[SparkSession, (DataFrame, DataFrame, DataFrame)]

  private def cleaned(spark: SparkSession): (DataFrame, DataFrame, DataFrame) =
    cache.getOrElseUpdate(spark, {
      val base = ensureFixtures()
      import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      (Clean.pin(JsonSource.readPin(spark, base)).persist(MEMORY_AND_DISK),
        Clean.geo(JsonSource.readGeo(spark, base)).persist(MEMORY_AND_DISK),
        Clean.user(JsonSource.readUser(spark, base)).persist(MEMORY_AND_DISK))
    })

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q60_pipeline_task4_top_category_per_country", None, (s, _) => {
      val (pin, geo, _) = cleaned(s); PinQueries.task4Df(pin, geo)
    }),
    QuerySpec("q61_pipeline_task5_posts_per_year", None, (s, _) => {
      val (pin, geo, _) = cleaned(s); PinQueries.task5Df(pin, geo)
    }),
    QuerySpec("q62_pipeline_task6_top_user_per_country", None, (s, _) => {
      val (pin, geo, user) = cleaned(s); PinQueries.task6Part1Df(pin, geo, user)
    }),
    QuerySpec("q63_pipeline_task7_top_category_per_age_group", None, (s, _) => {
      val (pin, _, user) = cleaned(s); PinQueries.task7Df(pin, user)
    }),
    QuerySpec("q64_pipeline_task8_median_follower_by_age", None, (s, _) => {
      val (pin, _, user) = cleaned(s); PinQueries.task8GroupByDf(pin, user)
    }),
    QuerySpec("q65_pipeline_task9_users_joined_per_year", None, (s, _) => {
      val (_, _, user) = cleaned(s); PinQueries.task9Df(user)
    }),
    QuerySpec("q66_pipeline_task10_median_follower_by_join_year", None, (s, _) => {
      val (pin, _, user) = cleaned(s); PinQueries.task10Df(pin, user)
    }),
    QuerySpec("q67_pipeline_task11_median_by_year_and_age", None, (s, _) => {
      val (pin, _, user) = cleaned(s); PinQueries.task11Df(pin, user)
    }),
    QuerySpec("q68_pipeline_top_tags_per_category", None, (s, _) => {
      val (pin, _, _) = cleaned(s); PinQueries.topTagsPerCategory(pin, 3)
    }))
}
