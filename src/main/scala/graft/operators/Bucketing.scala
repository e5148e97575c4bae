package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Morton (Z-order) key of two non-negative dimensions: bit-interleave
    * the low 32 bits of each, `a` on even positions, `b` on odd. Pure
    * codegen'd built-ins (shift/and/or ladder) — no custom expression,
    * no UDF. Quantize real domains to small non-negative ints first
    * (e.g. `hashOrder`, `DIV` time buckets). */
  def zorderKey(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** Spread the low 32 bits of a long across the even bit positions of
    * a 64-bit value (the classic magic-mask ladder). */
  private def spreadBits(c: Column): Column = {
    val v0 = c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val v4 = v3.bitwiseOR(shiftleft(v3, 2)).bitwiseAND(lit(0x3333333333333333L))
    v4.bitwiseOR(shiftleft(v4, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Order-preserving rank quantization of a dimension to `buckets`
    * equal-population buckets (NTILE semantics: the first n%k buckets
    * hold one extra value). Z-ORDER DIMS MUST BE QUANTIZED TO COMPARABLE
    * BIT WIDTHS: interleaving a 37-bit id with a 5-bit day puts every
    * discriminating bit of the curve on the id, i.e. a plain 1-D sort
    * wearing a Morton costume — measured at sf1: unquantized win 1.01×
    * vs 1.29× decode reduction after balancing (SCALING.md round-7
    * note).
    *
    * Through r7 this was `NTILE over an unpartitioned Window` on the
    * distinct set plus a forced broadcast of the full mapping — for the
    * motivating case itself (near-unique ids, distinct ≈ \|corpus\|)
    * that is a global single-reducer window AND an over-limit broadcast,
    * the exact pathology the catalog-wide guard bans, moved to the
    * write path. Now the rank is a distributed prefix sum (the Packing
    * discipline): range-partition the distinct values so partition
    * index order == value order, per-partition row_number (window
    * partitioned by _pid — parallel), per-partition counts collected
    * driver-side (bounded: ≤ defaultParallelism rows) become exclusive
    * offsets, and the bucket is closed-form from the global rank. The
    * mapping joins back WITHOUT a forced broadcast — AQE broadcasts it
    * when small and shuffles when it is corpus-sized. */
  def rankQuantize(df: DataFrame, dim: String, buckets: Int): DataFrame = {
    require(buckets > 0)
    val spark = df.sparkSession
    val parts = spark.sparkContext.defaultParallelism
    // persist so the counts collect and the mapping read the SAME
    // materialization — _pid must not be recomputed under re-sampled
    // range bounds (reclaimed by teardown/periodic GC like the other
    // persisting operators)
    val distinct = df.select(col(dim)).distinct()
      .repartitionByRange(parts, col(dim))
      .withColumn("_pid", spark_partition_id())
      .persist()
    val counts = distinct.groupBy(col("_pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val n = counts.map(_._2).sum
    var acc = 0L
    val offsetRows = counts.toSeq.map { case (p, c) =>
      val row = (p, acc); acc += c; row
    }
    import spark.implicits._
    val offsets = offsetRows.toDF("_pid", "_poff")
    val local = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_pid")).orderBy(col(dim))
    // NTILE closed form on the zero-based global rank: with q = n/k and
    // r = n%k, the first r buckets take q+1 values, the rest q
    val q = if (buckets > 0) n / buckets else 0L
    val r = n % buckets
    val bucket =
      if (q == 0L) col("_rank").cast("int") // n < k: one value per bucket
      else when(col("_rank") < lit(r * (q + 1)),
          expr(s"CAST(_rank DIV ${q + 1} AS INT)"))
        .otherwise(expr(s"CAST($r + (_rank - ${r * (q + 1)}) DIV $q AS INT)"))
    val mapping = distinct.join(broadcast(offsets), Seq("_pid"))
      .withColumn("_rank", row_number().over(local).cast("long") - 1 + col("_poff"))
      .select(col(dim), bucket.as(s"${dim}_q"))
    df.join(mapping, Seq(dim))
  }

  /** Write `df` Z-ordered on two dimensions: range-partition and sort by
    * the Morton key, so every output file (= row group at this size)
    * covers a compact rectangle-ish region of (dimA, dimB) space and its
    * parquet min/max stats are tight in BOTH dimensions. A scan with
    * predicates on both dims then skips the row groups a single-column
    * sort can't (1-D sort gives tight stats on one dim and useless ones
    * on the other). This is the open-format equivalent of Delta/Iceberg
    * OPTIMIZE ZORDER — same curve, plain parquet. Pruning win asserted
    * in LayoutSpec via records-read metrics. */
  def writeZOrdered(df: DataFrame, path: String,
      dimA: String, dimB: String, numFiles: Int): Unit =
    df.withColumn("_z", zorderKey(col(dimA), col(dimB)))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Compact a dataframe's files to a target size with BOUNDED row
    * groups — the maintenance pass every landing zone needs in both
    * directions: thousands of streaming micro-batch files make scans
    * metadata-bound (too many splits), while a single giant row group
    * makes them parallelism-bound (a parquet scan splits across row
    * groups, never within one — the round-6 finding behind
    * [[Fanout.forKernel]]; this writer is the at-rest fix). File count
    * comes from the optimizer's size estimate for the input plan;
    * `rowGroupBytes` caps row-group size so even a one-file output
    * stays splittable by any later `maxPartitionBytes` setting. */
  def compact(df: DataFrame, path: String,
      targetFileBytes: Long = 512L << 20,
      rowGroupBytes: Int = 8 << 20): Unit = {
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = (estBytes / targetFileBytes).toLong.max(1L).min(1 << 20).toInt
    df.repartition(nFiles)
      .write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", rowGroupBytes)
      .parquet(path)
  }
}
