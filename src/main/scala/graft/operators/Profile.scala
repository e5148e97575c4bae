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

  /** Per-slice HLL sketches (DataSketches HllSketch via
    * `hll_sketch_agg`) — the INCREMENTAL distinct-count path at 100 TB:
    * sketch each slice (day / source / partition) once at landing,
    * persist the binary, and answer any later cross-slice distinct
    * question by unioning sketches instead of rescanning the lake.
    * `lgK = 12` → 4 KiB per sketch, ~1.6% relative standard error. */
  def hllSlices(df: DataFrame, sliceCol: String, targetCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(col(sliceCol))
      .agg(hll_sketch_agg(col(targetCol), lit(lgK)).as("sketch"))

  /** Merge per-slice sketches to one global distinct estimate. HLL
    * union is lossless over same-lgK sketches (register-wise max), so
    * this equals sketching the union directly — asserted in
    * ProfileSpec, along with the error bound vs the exact count. */
  def hllMergedDistinct(slices: DataFrame): DataFrame =
    slices.agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
      .as("n_distinct"))

  /** Count-min sketch over `column` — bounded-memory frequency
    * estimation with one-sided error (estimate ≥ truth, overshoot
    * ≤ eps·N at `confidence`). The aggregation is distributed
    * (map-side partial merge); only the final w×d counter grid —
    * size fixed by (eps, confidence), independent of data — reaches
    * the driver, the same bounded-result class as [[rowStats]]. */
  def countMinSketch(df: DataFrame, column: String, eps: Double = 0.001,
      confidence: Double = 0.99, seed: Int = 42)
      : org.apache.spark.util.sketch.CountMinSketch = {
    val bytes = df
      .agg(count_min_sketch(col(column), lit(eps), lit(confidence), lit(seed))
        .as("cms"))
      .head().getAs[Array[Byte]](0)
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
  }
}
