package graft.operators

import graft.functions.{GraftFunctions, TextFunctions => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus deduplication operators, each designed for the 100 TB case:
  * candidate generation is always a narrow per-row signature followed by
  * an equi-join on short keys (hashable, shuffle-partitionable), never a
  * cross join; expensive verification (exact Jaccard / cosine) runs only
  * on candidate pairs.
  *
  * Output convention: `(id, keep_id, is_duplicate)` — one row per input
  * row; `keep_id` is the smallest id among the row's verified duplicates
  * (single-hop union, not full transitive closure — documented and
  * asserted in tests). A downstream `filter(!is_duplicate)` materializes
  * the deduped corpus.
  */
object Dedup {

  /** Exact dedup on a hash of the given columns (SURVEY.md A8-adjacent:
    * the reference dedups with SELECT DISTINCT; at scale we keep lineage
    * by electing a keeper per hash group instead of dropping rows). */
  def exact(df: DataFrame, idCol: String, cols: Seq[String]): DataFrame = {
    val h = xxhash64(cols.map(col): _*)
    df.select(col(idCol), h.as("content_hash"))
      .withColumn("keep_id", min(col(idCol)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("content_hash")))
      .select(
        col(idCol),
        col("content_hash"),
        col("keep_id"),
        (col(idCol) =!= col("keep_id")).as("is_duplicate"))
  }

  /** Exact dedup on normalized text (case/whitespace-insensitive). */
  def exactNormalized(df: DataFrame, idCol: String, textCol: String): DataFrame =
    exact(
      df.withColumn("_norm_text", T.normalizeText(col(textCol))),
      idCol, Seq("_norm_text"))
      .drop("_norm_text")

  /** Verified candidate pairs `(id_a, id_b, jaccard)` with id_a < id_b,
    * via MinHash-LSH banding: signature (k hashes) → `bands` band-hashes
    * → equi-self-join on (band, hash) → exact Jaccard on shingle sets →
    * threshold filter. The join keys are (int, long) — tiny — and the
    * wide shingle arrays are re-joined only for surviving candidates. */
  def minhashCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7): DataFrame = {
    // shingles are hashed to longs up front: signatures, the candidate
    // join, and exact-Jaccard verification all run over compact long
    // arrays instead of wide string arrays (64-bit collisions are
    // negligible vs the LSH approximation itself)
    // persisted: both the candidate self-join and the verification
    // re-joins consume these, and the two sides of a self-join are NOT
    // deduplicated by exchange reuse (different projections) — without
    // persist the shingle/signature computation runs 2×. Size is
    // id+hashes, tiny relative to the corpus; spills to disk if not.
    val sh = df.select(
      col(idCol),
      T.shingleHashes(col(textCol), shingleSize).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sig = sh.select(
      col(idCol), T.minhashSignature(col("sh"), numHashes).as("sig"))
    val banded = sig.select(
      col(idCol),
      posexplode(T.bandHashes(col("sig"), numHashes, bands)))
      .select(col(idCol), col("pos").as("band"), col("col").as("bh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = banded.select(col("band"), col("bh"), col(idCol).as("id_a"))
    val b = banded.select(col("band"), col("bh"), col(idCol).as("id_b"))
    val cand = a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    cand
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(
        col("id_a"), col("id_b"),
        T.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Connected components over a verified duplicate-pair set: every row
    * gets the MINIMUM id reachable through any chain of pairs (a~b, b~c
    * ⇒ a,b,c share keeper min(a,b,c)) — full transitive closure, unlike
    * the single-hop [[keeperFrom]].
    *
    * Algorithm: iterated min-label propagation over the undirected edge
    * list (the dense half of large-star/small-star). Each round is two
    * hash joins; label frames are persisted and the loop stops at
    * fixpoint — O(log n) rounds for chains, 1–2 rounds for typical
    * near-dup clusters. maxIter bounds pathological graphs. */
  def connectedComponents(
      df: DataFrame, idCol: String, pairs: DataFrame,
      maxIter: Int = 10): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // undirected edges (both directions) — a node's candidate label is
    // the min over its neighbors' labels and its own
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist(MEMORY_AND_DISK)
    var labels = df.select(col(idCol).as("node"), col(idCol).cast("long").as("label"))
      .persist(MEMORY_AND_DISK)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("node", "dst")
          .withColumnRenamed("label", "dst_label"), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(min(col("dst_label")).as("neighbor_label"))
      val updated = labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("neighbor_label"), col("label"))).as("label"))
        .persist(MEMORY_AND_DISK)
      val changed = updated.join(labels.withColumnRenamed("label", "old_label"), Seq("node"))
        .filter(col("label") =!= col("old_label")).limit(1).count()
      labels.unpersist()
      labels = updated
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    labels.select(col("node").as(idCol), col("label").as("keep_id"))
      .withColumn("is_duplicate", col(idCol).cast("long") =!= col("keep_id"))
  }

  /** Per-row keeper election from a verified pair set. */
  def keeperFrom(
      df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val best = pairs.groupBy(col("id_b").as(idCol))
      .agg(min(col("id_a")).as("partner_min"))
    df.select(col(idCol))
      .join(best, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(least(col("partner_min"), col(idCol)), col(idCol)).as("keep_id"))
      .withColumn("is_duplicate", col(idCol) =!= col("keep_id"))
  }

  /** MinHash-LSH near-dedup end to end: one row per input row. */
  def minhashLsh(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7): DataFrame =
    keeperFrom(df, idCol,
      minhashCandidatePairs(df, idCol, textCol, shingleSize, numHashes, bands, threshold))

  /** Per-row 64-bit SimHash over token hashes (custom single-pass
    * Catalyst expression — see [[graft.functions.SimHash64]]). */
  def simhashes(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(
      col(idCol),
      GraftFunctions.simhash64(
        transform(T.tokens(col(textCol)), t => xxhash64(t))).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, using
    * the banding trick: split the 64-bit hash into `64/(maxHamming+1)`-bit
    * chunks — any pair within the distance budget must agree exactly on
    * at least one chunk (pigeonhole), so candidates come from equi-joins
    * on (chunk_idx, chunk_value), never a cross join. */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    val sims = simhashes(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chunkCols = (0 until chunks).map { i =>
      shiftrightunsigned(col("simhash"), i * bitsPer)
        .bitwiseAND(lit((1L << bitsPer) - 1))
    }
    val banded = sims.select(
      col(idCol), col("simhash"),
      posexplode(array(chunkCols: _*)))
      .select(col(idCol), col("simhash"), col("pos").as("chunk"), col("col").as("cv"))
    val a = banded.select(col("chunk"), col("cv"),
      col(idCol).as("id_a"), col("simhash").as("sim_a"))
    val b = banded.select(col("chunk"), col("cv"),
      col(idCol).as("id_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("chunk", "cv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Benchmark decontamination: drop corpus rows whose normalized
    * content hash appears in a blocklist (e.g. eval-set documents) —
    * a broadcastable left-anti join on the hash, so the corpus streams
    * through map tasks untouched. */
  def decontaminate(corpus: DataFrame, textCol: String,
      blocklist: DataFrame, blocklistTextCol: String): DataFrame = {
    val bl = blocklist
      .select(md5(T.normalizeText(col(blocklistTextCol))).as("_block_hash"))
      .distinct()
    corpus
      .withColumn("_block_hash", md5(T.normalizeText(col(textCol))))
      .join(broadcast(bl), Seq("_block_hash"), "left_anti")
      .drop("_block_hash")
  }

  /** Deterministic pseudo-random sampling: keep rows whose Knuth-hashed
    * id lands under `percent`. Reproducible across runs/partitionings
    * (no rand()), and expressible in plain SQL for oracle checks. */
  def deterministicSample(df: DataFrame, idCol: String, percent: Int): DataFrame =
    df.filter(pmod(col(idCol) * 2654435761L, lit(100)) < percent)

  /** Brute-force word-n-gram Jaccard over a bounded id range — the
    * exact-verification baseline the LSH paths are tested against. Only
    * for small slices (quadratic); the scale path is minhashLsh. */
  def jaccardPairsBrute(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3): DataFrame = {
    val sh = df.select(
      col(idCol),
      T.shingleHashes(col(textCol), shingleSize).as("sh"))
    sh.select(col(idCol).as("id_a"), col("sh").as("sh_a"))
      .crossJoin(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        T.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
  }
}
