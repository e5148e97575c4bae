package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC-style merge (upsert) without a table format: fold a batch of
  * keyed updates into a base snapshot, keeping the highest-version row
  * per key. This is the compaction step of every incremental corpus
  * build (re-crawled documents, refreshed annotations); Delta/Iceberg
  * MERGE does it transactionally — the relational core is
  * union → per-key keep-latest, which is what this operator is.
  *
  * One shuffle on the key. Ties on `versionCol` break toward the
  * UPDATE side (the conventional merge semantics), then by a full-row
  * content hash — so the result is deterministic across partitionings
  * even when one batch carries several rows for the same (key, version)
  * (real CDC feeds do), not just for base-vs-update restatements.
  */
object Upsert {

  def merge(base: DataFrame, updates: DataFrame,
      keyCol: String, versionCol: String): DataFrame = {
    val tagged = base.withColumn("_src", lit(0))
      .unionByName(updates.withColumn("_src", lit(1)))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol).desc, col("_src").desc,
        xxhash64(base.columns.map(col): _*))
    tagged
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_src")
  }
}
