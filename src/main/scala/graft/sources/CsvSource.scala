package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S2 — CSV scan (the reference reads its credentials file with
  * `header=true, sep=","` — BatchProcessingFinal.ipynb:248-256).
  * Explicit-schema variant added for engine use: header inference is a
  * driver-side convenience, not something to run against 100 TB. */
object CsvSource {

  def read(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, sep: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString).option("sep", sep)
      .csv(path)

  /** Reference-parity form: header row + inferred types. */
  def readInferred(spark: SparkSession, path: String,
      header: Boolean = true, sep: String = ","): DataFrame =
    spark.read
      .option("header", header.toString).option("sep", sep)
      .option("inferSchema", "true")
      .csv(path)
}
