package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout operators for shuffle elimination at scale.
  *
  * A 100 TB fact table joined repeatedly on the same key should be
  * bucketed once at landing: both sides of a bucketed equi-join arrive
  * pre-hash-partitioned, so the join plans with zero Exchange nodes —
  * the shuffle is paid once at write time, amortized over every later
  * query. Likewise, partitioning the layout by a coarse time/tenant
  * column turns time-range predicates into partition pruning (the scan
  * never opens irrelevant files). Both are asserted in LayoutSpec.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key — plans without a
    * shuffle when both were bucketed with the same count on the key. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))

  /** Write `df` partitioned by a layout column (directory-level). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)
}
