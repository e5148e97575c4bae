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

  /** Snapshot diff — [[merge]]'s read-side complement: classify every
    * key across two corpus VERSIONS as added / removed / changed /
    * unchanged by a content fingerprint. This is the audit every
    * versioned corpus build publishes between releases (what did the
    * re-crawl actually change?) and the input to incremental
    * downstream recomputes (only `added ∪ changed` re-embeds).
    *
    * `fingerprint` is evaluated against each side's own columns (use a
    * cross-engine-checkable hash like `md5(text)` when an oracle
    * matters). One shuffle per side into the full-outer join on the
    * key — the same exchange any keyed reconciliation pays; at scale
    * both sides prune to (key, hash) before shuffling, so the wire
    * carries fingerprints, never documents. */
  def diff(v1: DataFrame, v2: DataFrame,
      keyCol: String, fingerprint: org.apache.spark.sql.Column): DataFrame = {
    val a = v1.select(col(keyCol), fingerprint.as("_h1"))
    val b = v2.select(col(keyCol), fingerprint.as("_h2"))
    a.join(b, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("_h1").isNull, "added")
          .when(col("_h2").isNull, "removed")
          .when(col("_h1") =!= col("_h2"), "changed")
          .otherwise("unchanged").as("status"))
  }
}
