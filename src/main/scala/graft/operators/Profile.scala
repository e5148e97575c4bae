package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Data-profiling operators — the reference's interactive debugging
  * surface (SURVEY.md A1/A9/F12: value-frequency dumps, distinct
  * cardinality loops, null-count recipes) as single-job engine API.
  *
  * The reference loops `.show()` per column, one Spark job each
  * (flagged as a de-optimization in SURVEY §4.3); these fold every
  * column into ONE aggregation pass.
  */
object Profile {

  /** Frequency of each value of `column`, most frequent first
    * (A1: `groupBy(col).count().orderBy(desc)`). */
  def valueCounts(df: DataFrame, column: String): DataFrame =
    df.groupBy(col(column)).agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col(column))

  /** Null (and NaN, for floating columns) count per column in one pass
    * (F12's intent, minus the reference's isNull-misuse error). */
  def nullCounts(df: DataFrame): DataFrame = {
    val aggs = df.schema.fields.map { f =>
      val isNull = f.dataType match {
        case DoubleType | FloatType => col(f.name).isNull || isnan(col(f.name))
        case _ => col(f.name).isNull
      }
      sum(when(isNull, 1L).otherwise(0L)).as(f.name)
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Distinct cardinality per column in one pass — exact for smallish
    * domains, or HLL (approx_count_distinct) for 100 TB profiling. */
  def distinctCounts(df: DataFrame, approx: Boolean = false): DataFrame = {
    val aggs = df.columns.map { c =>
      if (approx) approx_count_distinct(col(c)).as(c)
      else countDistinct(col(c)).as(c)
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Rows/distinct-rows summary (A9: `df.count`, `df.distinct().count`). */
  def rowStats(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.count()
    val d = df.distinct().count()
    Seq((n, d, n - d)).toDF("n_rows", "n_distinct_rows", "n_duplicate_rows")
  }
}
