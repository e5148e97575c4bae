package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for each left row, the latest right row with
  * `right.time <= left.time` on the same key. Spark has no native as-of
  * join; per the preference order (SURVEY §7.3 / the build brief) this
  * composes existing operators instead of a custom SparkPlan:
  *
  *   union(tagged left ∪ tagged right)
  *     → window last(right_payload, ignoreNulls) over
  *       (PARTITION BY key ORDER BY time, side) — rights sort before
  *       lefts at equal time, so the match is inclusive
  *     → keep left rows.
  *
  * One shuffle on the key (the join itself would shuffle identically);
  * state per window is a single carried struct, so memory is O(1) per
  * partition stream, not O(rows). The right side must be unique per
  * (key, time) for deterministic results — dedupe first (e.g.
  * `Dedup.deterministicSample`-style keep-max rules) as the tests and
  * q51 do.
  */
object AsofJoin {

  def asofBackward(
      left: DataFrame, right: DataFrame,
      key: String, time: String,
      rightCols: Seq[String]): DataFrame = {
    val leftStruct = struct(left.columns.map(col): _*).as("_l")
    val rightStruct = struct(rightCols.map(col): _*).as("_r")
    val lPrep = left.select(
      col(key).as("_k"), col(time).as("_t"), lit(1).as("_side"),
      leftStruct, lit(null).cast(right.select(rightCols.map(col): _*).schema
        .fields.foldLeft(new org.apache.spark.sql.types.StructType)(_ add _)).as("_r"))
    val rPrep = right.select(
      col(key).as("_k"), col(time).as("_t"), lit(0).as("_side"),
      lit(null).cast(left.schema
        .fields.foldLeft(new org.apache.spark.sql.types.StructType)(_ add _)).as("_l"),
      rightStruct)
    val w = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lPrep.unionByName(rPrep)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_l.*") +: rightCols.map(c => col(s"_asof.$c").as(s"asof_$c")): _*)
  }
}
