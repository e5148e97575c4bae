package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key joins and aggregations.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin`) covers
  * sort-merge joins at runtime; explicit salting remains the tool when
  * (a) a known-hot key dominates a shuffle hash join, or (b) a two-level
  * aggregation needs to spread a hot group. Salting is semantics-
  * preserving: tests assert salted == plain results.
  */
object Skew {

  /** Salted inner equi-join on `key`: the left (large, skewed) side gets
    * a random-but-deterministic salt in [0, salts); the right side is
    * exploded `salts`× so every (key, salt) pair finds its match. Row
    * multiplication happens on the SMALL side only. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    require(salts > 0)
    // deterministic salt: hash of the whole row spread over buckets —
    // avoids rand() (non-reproducible across retries, breaks AQE reuse)
    val saltedLarge = large.withColumn(
      "_salt", pmod(xxhash64(large.columns.map(col): _*), lit(salts)))
    val saltedSmall = small
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("_salt", col("_salt").cast("long"))
    saltedLarge.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-level aggregation for skewed group keys: count per (key, salt)
    * partially, then merge per key. Generalizes to any associative agg
    * via the exprs map: level-1 computes them per (key, salt); callers
    * supply the level-2 merge. Convenience for plain counts: */
  def skewAwareCount(df: DataFrame, key: String, salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(df.columns.map(col): _*), lit(salts)))
      // per-ROW salt spreads a hot key over `salts` reducers at level 1;
      // level 2 merges ≤ `salts` rows per key — negligible
      .groupBy(col(key), col("_salt")).agg(count(lit(1)).as("_c"))
      .groupBy(col(key)).agg(sum("_c").as("count"))
}
