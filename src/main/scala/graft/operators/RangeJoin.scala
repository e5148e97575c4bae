package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch range join — match each point to every interval containing it
  * (`start <= t <= end`), with or without additional equi-keys.
  *
  * Spark has no native range join: a pure inequality condition plans as
  * BroadcastNestedLoopJoin (banned catalog-wide by PlanSpec) and an
  * equi-key + range condition hash-joins on the key but re-checks every
  * interval of that key per point — quadratic under hot keys. The
  * scale-native shape is BUCKET DECOMPOSITION, the same move as the
  * windowed hot-key operators: quantize time into `bucket`-sized cells,
  * explode each interval onto the cells it covers (≈ span/bucket + 1
  * rows — size `bucket` to the TYPICAL span so this stays O(1)), tag
  * each point with its one cell, hash-join on (cell [, keys]) and
  * post-filter the exact range. Candidates per point are the intervals
  * overlapping its cell, not all intervals (of the key / globally) —
  * the join is an equi-join Catalyst can shuffle-partition, AQE-skew
  * split, and codegen.
  *
  * Intervals with `end < start` match nothing; points and interval
  * bounds must be non-negative (DIV truncates toward zero, the same
  * contract as the windowed operators). Oracle-checked as q88 against
  * DuckDB's native inequality join. */
object RangeJoin {

  /** One row per (point, containing interval). Point columns keep their
    * names; interval columns arrive prefixed `ival_`. */
  def pointInInterval(
      points: DataFrame, pointTime: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucket: Long, keys: Seq[String] = Nil): DataFrame = {
    require(bucket > 0)
    val iPref = intervals.columns.foldLeft(intervals) { (df, c) =>
      df.withColumnRenamed(c, s"ival_$c")
    }
    val exploded = iPref
      .filter(col(s"ival_$startCol") <= col(s"ival_$endCol"))
      .withColumn("_cell", explode(sequence(
        expr(s"CAST(ival_$startCol AS BIGINT) DIV $bucket"),
        expr(s"CAST(ival_$endCol AS BIGINT) DIV $bucket"))))
    val tagged = points.withColumn("_cell",
      expr(s"CAST($pointTime AS BIGINT) DIV $bucket"))
    val cond = keys.foldLeft(tagged("_cell") === exploded("_cell")) {
      (c, k) => c && tagged(k) === exploded(s"ival_$k")
    }
    tagged.join(exploded, cond)
      .filter(col(pointTime) >= col(s"ival_$startCol") &&
        col(pointTime) <= col(s"ival_$endCol"))
      .drop("_cell")
  }
}
