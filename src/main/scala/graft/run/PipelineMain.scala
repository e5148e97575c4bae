package graft.run

import graft.pipeline.{Clean, PinQueries}
import graft.sources.JsonSource
import org.apache.spark.sql.SparkSession

/** The batch driver replacing the reference's Airflow → Databricks
  * orchestration (dag/0af8d0adfd13_dag.py; SURVEY.md §3.4): a plain,
  * cron-able `main()` that runs scan → clean → all eight tasks → parquet
  * out. Retries are the scheduler's job (the DAG's `retries: 5` maps to
  * the cron/workflow layer, not the engine).
  *
  * Usage: PipelineMain <landedBaseDir> <outDir>
  *   landedBaseDir — contains topics/{pin,geo,user}/partition=N/ JSON files
  *   outDir        — one parquet dir per task + per cleaned table
  */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    val Array(baseDir, outDir) = args.take(2)
    val spark = SparkSession.builder()
      .appName("graft-pipeline")
      // spark-submit injects spark.master; standalone runs fall back local
      .master(sys.props.getOrElse("spark.master",
        sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]")))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()

    // the transport seam (SURVEY §7.1.2): swap FileJsonTableSource for
    // KafkaTableSource(bootstrap, prefix) and nothing downstream changes
    val source = graft.sources.FileJsonTableSource(baseDir)
    import graft.sources.PipelineTable._
    val pin = Clean.pin(source.readBatch(spark, Pin))
    val geo = Clean.geo(source.readBatch(spark, Geo))
    val user = Clean.user(source.readBatch(spark, User))

    // cleaned tables land as parquet (columnar at rest — fixes the
    // reference's one-JSON-file-per-message landing, SURVEY §4.2)
    pin.write.mode("overwrite").parquet(s"$outDir/clean/pin")
    geo.write.mode("overwrite").parquet(s"$outDir/clean/geo")
    user.write.mode("overwrite").parquet(s"$outDir/clean/user")

    for ((name, df) <- PinQueries.allDf(pin, geo, user).toSeq.sortBy(_._1))
      df.write.mode("overwrite").parquet(s"$outDir/tasks/$name")

    spark.stop()
  }
}
