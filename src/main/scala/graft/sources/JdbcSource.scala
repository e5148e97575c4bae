package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S7 — JDBC source. The reference's emulator samples single random
  * MySQL rows per tick (`SELECT * FROM t LIMIT {offset}, 1` — an O(n)
  * scan per record, flagged as a de-optimization in SURVEY §4.3); the
  * engine-grade replacement is a partitioned bulk read: Spark splits
  * the table into `numPartitions` range predicates on `partitionColumn`
  * and reads them in parallel.
  *
  * Tested against embedded Derby (shipped with Spark for the Hive
  * metastore) in JdbcSpec — plain and range-partitioned reads; the
  * deterministic [[EmulatorGenerator]] stands in for the emulator role
  * in the pipeline tests.
  */
object JdbcSource {

  def read(spark: SparkSession, url: String, table: String,
      user: String, password: String,
      partitionColumn: Option[String] = None,
      lowerBound: Long = 0L, upperBound: Long = 0L,
      numPartitions: Int = 8): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
    partitionColumn match {
      case Some(c) => base
        .option("partitionColumn", c)
        .option("lowerBound", lowerBound.toString)
        .option("upperBound", upperBound.toString)
        .option("numPartitions", numPartitions.toString)
        .load()
      case None => base.load()
    }
  }
}
