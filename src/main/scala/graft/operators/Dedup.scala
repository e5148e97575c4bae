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
  *
  * Cache lifetime: pair-set operators (minhash, hamming, containment,
  * cluster pairs) materialize their PAIR-GRAIN result eagerly via
  * [[materializeSmall]] and free every internal cache (banded
  * signatures, hot-bucket lists, shingle postings) before returning —
  * no corpus-grain block outlives a call, so a long-lived service can
  * invoke them per-epoch without accumulating cache. The one retained
  * footprint is the result itself when it exceeds the driver bound
  * (then a pair-grain localCheckpoint, documented on the helper).
  * Cleanup touches only blocks these operators created themselves
  * ([[materializeSmall]] unpersists its own checkpoint RDD, taken from
  * the checkpointed plan; per-operator cleanups hold direct references)
  * — a concurrent job's caches are never diffed or freed, so per-epoch
  * invocation from a multi-tenant service is safe (r15).
  */
object Dedup {

  /** Default shingle hash family (codegen'd single-pass
    * ShingleHashes64). The md5-prefix twin
    * (`TextFunctions.md5ShingleHashes`) trades per-row cost for a
    * family DuckDB can replay — either way the kernel runs exactly
    * once over the corpus (see [[minhashCandidatePairs]]), so the
    * choice is oracle-replayability, not a persist policy. */
  val defaultShingleHasher: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column =
    T.shingleHashes

  /** Default absolute document-frequency cap for
    * [[containmentPairs]] — shared with the q182/q191/q194 oracle SQL
    * (interpolated there, never hard-coded) so engine and reference
    * cannot desync when the default moves. */
  val DefaultMaxDfAbs: Int = 1024

  /** Materialize a (pair-grain) result with exactly ONE evaluation so
    * upstream caches can be freed before returning: an eager
    * localCheckpoint lands the rows as distributed blocks, then a tiny
    * result (≤ `maxDriverRows`) is collapsed to a LocalRelation and its
    * checkpoint blocks released — zero retained executor blocks, and
    * the local rows broadcast into downstream joins for free. A LARGE
    * result stays as the checkpoint: re-scannable at partition
    * parallelism with no driver round-trip (an r14.0 lesson — a
    * LocalRelation of 10⁵⁺ pair rows re-serializes from the driver
    * into every consuming stage, which at sf1 cost more than the joins
    * it fed). Its pair-grain blocks are the one retained footprint,
    * owned by the caller's session — the same regime split as
    * [[connectedComponents]]'s `maxDriverEdges`. */
  private[operators] def materializeSmall(
      df: DataFrame, maxDriverRows: Int = 32768): DataFrame = {
    val ckpt = df.localCheckpoint(true)
    if (ckpt.count() > maxDriverRows) ckpt
    else {
      val out = df.sparkSession.createDataFrame(
        java.util.Arrays.asList(ckpt.collect(): _*), df.schema)
      // release exactly the checkpoint blocks the LocalRelation
      // replaced: the checkpointed frame's plan IS a LogicalRDD over
      // the persisted RDD, so we unpersist that specific RDD rather
      // than diffing the global persistent-RDD registry — a concurrent
      // job persisting its own blocks between our snapshot and diff
      // (the r15 advice race) can no longer have its cache freed out
      // from under it
      ckpt.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.foreach(_.unpersist(false))
      out
    }
  }

  /** Exact dedup on a hash of the given columns (SURVEY.md A8-adjacent:
    * the reference dedups with SELECT DISTINCT; at scale we keep lineage
    * by electing a keeper per hash group instead of dropping rows).
    * Keeper election is an aggregate + join-back, not a window over the
    * content hash (r14): the window form buffers a duplicate clique's
    * ENTIRE instance set in one window partition — a degenerate corpus
    * (10⁸ empty/boilerplate pages hash-equal) is a single-reducer
    * stage — while min-per-hash pre-combines map-side and the join
    * probe streams (AQE skew-split applies if a clique's probe volume
    * itself skews). */
  def exact(df: DataFrame, idCol: String, cols: Seq[String]): DataFrame = {
    val h = xxhash64(cols.map(col): _*)
    val hashed = df.select(col(idCol), h.as("content_hash"))
    val keepers = hashed.groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keep_id"))
    hashed.join(keepers, Seq("content_hash"))
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

  /** INCREMENTAL ingest dedup — the nightly-batch staple the global
    * operators above don't cover: a fresh batch arrives, the corpus
    * already holds an INDEX of content hashes from previous runs, and
    * the batch must drop (a) within-batch duplicates (keeper = min id,
    * as [[exact]]) and (b) anything whose content the index already
    * has. Returns the surviving rows of `incoming` plus their
    * `content_hash` — exactly what the caller appends to the index for
    * the next run.
    *
    * Scale shape: at 100 TB the index is billions of hashes — far past
    * broadcast — so the [[decontaminateBloom]] discipline gates the
    * exact check: a bounded-bytes bloom filter aggregated FROM the
    * index broadcasts to every task, definite negatives (the
    * overwhelming majority of a fresh crawl) short-circuit map-side
    * with zero exchange, and only bloom positives anti-join the index,
    * co-partitioned on the hash — the one exchange scales with
    * |positives|, not |batch| or |index|. False positives cost an
    * exact re-check, never a wrong drop (asserted under a
    * collision-heavy filter in DedupSpec).
    *
    * Hash family: md5 over normalized text — the at-rest index family
    * a DuckDB oracle can replay (q130); the xxhash64 production family
    * drops in identically (same discipline as [[decontaminateNgrams]]). */
  def dedupIncremental(incoming: DataFrame, idCol: String, textCol: String,
      indexHashes: DataFrame, indexHashCol: String,
      expectedItems: Long = 1000000L, numBits: Long = 1L << 23,
      precomputedBloom: Option[Array[Byte]] = None): DataFrame = {
    import org.apache.spark.sql.graft.shim
    val idx = indexHashes.select(col(indexHashCol).as("_ih")).distinct()
    // within-batch keepers via ONE min_by aggregate, not a window over
    // the content hash (the [[exact]] r14 rationale — a hot clique
    // buffers its whole instance set in one window partition — without
    // the join-back's second kernel pass: min_by's partial state is one
    // row per group, so a clique pre-combines map-side to one full row
    // per map task and the keeper row rides the aggregate exchange)
    val batchHashed = Fanout.forKernel(incoming)
      .withColumn("content_hash", md5(T.normalizeText(col(textCol))))
    val batchKept = batchHashed.groupBy(col("content_hash"))
      .agg(min_by(struct(batchHashed.columns.map(col): _*), col(idCol)).as("_r"))
      .select(col("_r.*"))
    // `precomputedBloom` (streaming twins): the filter is the fold of
    // at-rest per-batch sidecars ([[graft.streaming.IndexState]]) —
    // built from the SAME xxhash64(hash) elements — so the index is
    // never scanned to build it (the r16 weak item: a per-batch
    // BloomFilterAggregate over the whole index made micro-batch cost
    // linear in landed corpus).
    val bloomBytes = precomputedBloom.getOrElse {
      idx.select(shim.column(
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
            shim.expression(xxhash64(col("_ih"))),
            shim.expression(lit(expectedItems)), shim.expression(lit(numBits)))
            .toAggregateExpression()).as("_bf"))
        .head().getAs[Array[Byte]]("_bf")
    }
    if (bloomBytes == null) return batchKept // empty index: batch dedup only
    // reference-held probe, ONE deserialize for both probe sites — a
    // bloom-bytes Literal makes every plan rehash the megabyte through
    // analysis/AQE (see graft.functions.BloomProbe)
    val bloomF = graft.functions.BloomProbe.deserialize(bloomBytes)
    def mightContain(h: org.apache.spark.sql.Column) =
      graft.functions.BloomProbe(bloomF, xxhash64(h))
    // zero-positive fast path: when NO batch hash is bloom-positive —
    // the overwhelmingly common fresh-crawl batch — the index is
    // provably disjoint and the anti-join (whose right side would scan
    // the index) is skipped entirely. The check is one bounded job
    // over the batch (limit-1 after the filter), never over the index.
    // STREAMING callers only (precomputedBloom set): a batch caller
    // already paid a full index scan to AGGREGATE its bloom, so the
    // skippable anti-join is second-order for it while the probe is a
    // guaranteed extra job — the r17 q130 1.35× constant (VERDICT r17
    // wrong#4); batch callers go straight to the split plan.
    val positives = batchKept.filter(mightContain(col("content_hash")))
    if (precomputedBloom.isDefined && positives.isEmpty) return batchKept
    batchKept.filter(!mightContain(col("content_hash")))
      .unionByName(
        positives.join(idx, col("content_hash") === col("_ih"), "left_anti"))
  }

  /** Candidate (id_a < id_b) pairs from a banded signature frame via
    * equi-self-join on the bucket keys, with a per-bucket frequency cap:
    * a degenerate bucket (boilerplate band value, empty docs) of size n
    * would emit n(n-1)/2 pairs — one quadratic bucket can dominate the
    * whole job at corpus scale (VERDICT r1 wrong#5). Buckets larger than
    * `cap` instead emit a STAR to the bucket's min id: n-1 pairs, still
    * connected, so downstream transitive closure reconnects identical
    * content exactly. Tradeoff (documented, deliberate): within a hot
    * bucket, merely-similar (non-identical) members are only verified
    * against the representative, so a member pair whose similarity
    * exists only via that bucket can be missed — at the gain of bounded
    * work regardless of skew. */
  /** INCREMENTAL perceptual-signature dedup — [[dedupIncremental]]'s
    * Hamming-ball analogue for 64-bit image/simhash signatures: a fresh
    * batch must drop (a) within-batch near-dups (single-hop min-id
    * keeper over [[hammingPairs]]) and (b) anything within `maxHamming`
    * of a signature already in the at-rest INDEX. Returns the surviving
    * `(idCol, hashCol)` rows of `incoming`.
    *
    * Scale shape: the index check is the pigeonhole band join gated by
    * a bounded-bytes bloom over the index's (chunk_idx, chunk_value)
    * set — a batch signature none of whose maxHamming+1 chunks is
    * bloom-positive is provably > maxHamming from every indexed
    * signature and short-circuits map-side with zero exchange; only
    * bloom-positive chunks join the index chunk table, so the one
    * exchange scales with |candidate chunks|, not |batch| or |index|.
    * False positives cost a popcount re-check, never a wrong drop. */
  def dedupIncrementalHamming(incoming: DataFrame, idCol: String,
      hashCol: String, indexHashes: DataFrame, indexHashCol: String,
      maxHamming: Int, expectedItems: Long = 1000000L,
      numBits: Long = 1L << 23,
      precomputedBloom: Option[Array[Byte]] = None): DataFrame = {
    import org.apache.spark.sql.graft.shim
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    def chunkCols(h: org.apache.spark.sql.Column) = (0 until chunks).map { i =>
      shiftrightunsigned(h, i * bitsPer).bitwiseAND(lit((1L << bitsPer) - 1))
    }
    // (a) within-batch single-hop keepers
    val pairs = hammingPairs(incoming, idCol, hashCol, maxHamming)
    val batchKept = incoming.select(col(idCol), col(hashCol))
      .join(pairs.select(col("id_b").as(idCol)).distinct(), Seq(idCol), "left_anti")
    val idx = indexHashes.select(col(indexHashCol).cast("long").as("_ih")).distinct()
    // (b) bloom over the index's pigeonhole (chunk, value) keys — from
    // the at-rest sidecar fold when the caller maintains one
    // ([[graft.streaming.IndexState.dhashElems]], same elements), else
    // aggregated from the index here (batch/one-shot callers).
    val bloomBytes = precomputedBloom.getOrElse {
      if (idx.isEmpty) return batchKept
      idx.select(col("_ih"), posexplode(array(chunkCols(col("_ih")): _*)))
        .select(shim.column(
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
            shim.expression(xxhash64(col("pos"), col("col"))),
            shim.expression(lit(expectedItems)), shim.expression(lit(numBits)))
            .toAggregateExpression()).as("_bf"))
        .head().getAs[Array[Byte]]("_bf")
    }
    if (bloomBytes == null) return batchKept
    val bloomF = graft.functions.BloomProbe.deserialize(bloomBytes)
    def mightContain(c: org.apache.spark.sql.Column, cv: org.apache.spark.sql.Column) =
      graft.functions.BloomProbe(bloomF, xxhash64(c, cv))
    val banded = batchKept.select(col(idCol), col(hashCol),
        posexplode(array(chunkCols(col(hashCol)): _*)))
      .select(col(idCol), col(hashCol), col("pos").as("_c"), col("col").as("_cv"))
      .filter(mightContain(col("_c"), col("_cv")))
    // zero-candidate fast path: a batch none of whose signatures has a
    // single bloom-positive chunk is provably > maxHamming from every
    // indexed signature — skip the index chunk join (and its index
    // scan) entirely; the check is one bounded job over the batch.
    if (banded.isEmpty) return batchKept
    val idx4 = idx.select(col("_ih"), posexplode(array(chunkCols(col("_ih")): _*)))
      .select(col("_ih"), col("pos").as("_c"), col("col").as("_cv"))
    val hits = banded.join(idx4, Seq("_c", "_cv"))
      .filter(bit_count(col(hashCol).bitwiseXOR(col("_ih"))) <= maxHamming)
      .select(col(idCol)).distinct()
    batchKept.join(hits, Seq(idCol), "left_anti")
  }

  /** Within-cluster candidate pairs — the public face of
    * [[cappedBucketPairs]] for cluster-keyed dedup (SemDeDup / q153):
    * one cluster id column plays the bucket key, a hot cluster emits a
    * star to its min id instead of |cluster|² pairs. */
  def clusterPairs(assigned: DataFrame, clusterCol: String, idCol: String,
      cap: Int = 4096): DataFrame =
    cappedBucketPairs(assigned.select(col(clusterCol), col(idCol)),
      Seq(clusterCol), idCol, cap)

  private[operators] def cappedBucketPairs(
      banded: DataFrame, keys: Seq[String], idCol: String, cap: Int): DataFrame = {
    val (plan, cleanup) = cappedBucketPairsLazy(banded, keys, idCol, cap)
    val out = materializeSmall(plan)
    cleanup()
    out
  }

  /** Lazy core of [[cappedBucketPairs]]: the capped candidate-pair PLAN
    * over an internally persisted banded frame, plus a cleanup that
    * frees both internal caches. Callers that verify candidates
    * (minhash Jaccard, hamming popcount) weave the plan into their
    * verification join so candidates flow straight into it — the
    * UNVERIFIED pair set is never materialized (at sf1's replica-clique
    * corpus it is 10⁵–10⁶ rows; shipping it through the driver was the
    * r14.0 regression) — then call `cleanup` once the verified result
    * is materialized. */
  private[operators] def cappedBucketPairsLazy(
      banded: DataFrame, keys: Seq[String], idCol: String, cap: Int)
      : (DataFrame, () => Unit) = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val cached = banded.persist(MEMORY_AND_DISK)
    // hot-bucket detection is a map-side-combining aggregate over the
    // narrow keys (NOT a window over the full frame, which would cost an
    // extra row-level shuffle): the surviving hot list holds at most
    // |banded|/cap buckets — broadcastable by construction — so both the
    // cold/hot split and the star-pair build are map-side joins. The
    // detection is ADAPTIVE: one bounded driver action checks whether any
    // hot bucket exists at all, and the no-skew case (overwhelmingly
    // common) runs the plain self-join with zero split overhead.
    val hot = cached.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_n"), min(col(idCol)).as("_rep"))
      .filter(col("_n") > cap)
      .select(keys.map(col) :+ col("_rep"): _*)
      .persist(MEMORY_AND_DISK)
    // NB the probe is an eager job: CONSTRUCTING the plan runs the
    // signature+banding subtree once (into the banded cache) — the
    // cost buys the adaptive no-skew fast path below.
    val anyHot = hot.limit(1).count() > 0
    val pairsPlan = if (!anyHot) {
      val a = cached.select(keys.map(col) :+ col(idCol).as("id_a"): _*)
      val b = cached.select(keys.map(col) :+ col(idCol).as("id_b"): _*)
      a.join(b, keys)
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    } else {
      val cold = cached.join(broadcast(hot.select(keys.map(col): _*)), keys, "left_anti")
      val a = cold.select(keys.map(col) :+ col(idCol).as("id_a"): _*)
      val b = cold.select(keys.map(col) :+ col(idCol).as("id_b"): _*)
      val coldPairs = a.join(b, keys)
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      val hotPairs = cached.join(broadcast(hot), keys)
        .filter(col(idCol) =!= col("_rep"))
        .select(col("_rep").as("id_a"), col(idCol).as("id_b")) // _rep is the min ⇒ a < b
      coldPairs.union(hotPairs).distinct()
    }
    (pairsPlan, () => { cached.unpersist(false); hot.unpersist(false) })
  }

  /** Verified candidate pairs `(id_a, id_b, jaccard)` with id_a < id_b,
    * via MinHash-LSH banding: signature (k hashes) → `bands` band-hashes
    * → capped equi-self-join on (band, hash) → exact Jaccard on shingle
    * sets → threshold filter. The join keys are (int, long) — tiny — and
    * the wide shingle arrays are re-joined only for surviving candidates.
    * `hotBucketCap` bounds degenerate buckets (see [[cappedBucketPairs]]). */
  def minhashCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, hotBucketCap: Int = 4096,
      shingleHasher: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column =
        defaultShingleHasher,
      ophDensified: Boolean = false): DataFrame = {
    // shingles are hashed to longs up front: signatures, the candidate
    // join, and exact-Jaccard verification all run over compact long
    // arrays instead of wide string arrays (64-bit collisions are
    // negligible vs the LSH approximation itself)
    // Kernel-evaluation discipline (r14, replacing r13's per-family
    // persist policy and its never-unpersisted corpus-sized cache): the
    // shingle hasher runs exactly ONCE over the corpus — inside the
    // banded-signature subtree that cappedBucketPairs materializes —
    // and verification re-hashes ONLY docs that appear in a candidate
    // pair. The candidate-id semi-join sits BELOW the hash projection,
    // so even an expensive family (md5ShingleHashes: one md5 digest
    // per shingle — three corpus evaluations of it were q91's 7→32 s
    // sf1 drift) never re-hashes the corpus, and NO corpus-grain frame
    // is ever cached: candidate sets are a sliver of the corpus by
    // construction, so two candidate-grain re-hashes cost less than
    // one corpus-grain array<long> cache write at every scale.
    val src = Fanout.forKernel(df)
    def hashed(rows: DataFrame): DataFrame = rows.select(
      col(idCol), shingleHasher(col(textCol), shingleSize).as("sh"))
    // `ophDensified` swaps the signature family only: densified
    // one-permutation hashing ([[graft.functions.OphSignature]]) costs
    // O(|shingles| + k) per doc instead of O(k·|shingles|) — the
    // 100 TB signature-stage knob; banding, capping and exact-Jaccard
    // verification are identical, so the final pair set differs only
    // through candidate recall (measured vs exact truth in q196).
    val sigExpr =
      if (ophDensified) T.ophSignature(col("sh"), numHashes)
      else T.minhashSignature(col("sh"), numHashes)
    val sig = hashed(src).select(col(idCol), sigExpr.as("sig"))
    val banded = sig.select(
      col(idCol),
      posexplode(T.bandHashes(col("sig"), numHashes, bands)))
      .select(col(idCol), col("pos").as("band"), col("col").as("bh"))
    // Candidates flow LAZILY into the Jaccard verify — the unverified
    // pair set (10⁵–10⁶ rows on a replica-clique corpus) is never
    // materialized, persisted, or shipped through the driver; it is
    // referenced ONCE, so the whole verify is a single pipelined
    // action over the warm banded cache. r15: verification hashes the
    // corpus ONCE — each candidate pair explodes into its two member
    // ids, a single join attaches that doc's shingle set, and a
    // pair-grain regroup reassembles (sh_a, sh_b). The former shape
    // joined the hash projection twice (id_a side, id_b side) — TWO
    // corpus-grain kernel evaluations, the residual the r14 lifecycle
    // redesign left behind (q38@sf1 3.2 → 4.2 s min); this shape pays
    // instead one candidate-grain exchange of the matched shingle
    // arrays, a sliver of the corpus by construction. Kernel
    // evaluations per call: banding + one verify pass, zero cache
    // footprint either way. (Restricting per-side rejoins to candidate
    // ids — the r14 alternative — kept both kernel evaluations AND
    // added a capped-join pass; it measured 12.2 s vs ~6 s on q91@sf1
    // and stays rejected.)
    val (cand, bucketCleanup) =
      cappedBucketPairsLazy(banded, Seq("band", "bh"), idCol, hotBucketCap)
    val sh = hashed(src)
    val verified = cand
      .select(col("id_a"), col("id_b"),
        explode(array(col("id_a"), col("id_b"))).as(idCol))
      .join(sh, Seq(idCol))
      .groupBy(col("id_a"), col("id_b"))
      .agg(
        first(when(col(idCol) === col("id_a"), col("sh")),
          ignoreNulls = true).as("sh_a"),
        first(when(col(idCol) === col("id_b"), col("sh")),
          ignoreNulls = true).as("sh_b"))
      .select(
        col("id_a"), col("id_b"),
        T.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    // verified pairs ARE small — materialize them, then free the
    // banded caches: no block outlives the call (header contract)
    val out = materializeSmall(verified)
    bucketCleanup()
    out
  }

  /** Incremental twin of [[minhashCandidatePairs]] for the sticky-split
    * contract (q212): verified pair sets for BOTH a subset snapshot
    * (rows passing `subsetPred`) and the full frame, from ONE evaluation
    * of the signature+banding kernel (r21 optimization round, guide §5
    * reuse). Signatures and band hashes are per-row functions of the
    * text alone — corpus-independent — so the subset's banded frame IS
    * the full banded frame filtered; only the hot-bucket CAPPING is
    * corpus-dependent, and it runs separately per snapshot on the
    * filtered/unfiltered views (bit-identical to two independent calls:
    * the hot census, the cold/hot split and the verify see exactly the
    * rows a from-scratch run over the subset would). The former shape —
    * two independent calls — evaluated the corpus-grain shingle+
    * signature kernel twice; this one persists the narrow banded frame
    * (id, band, bh) once and both cappings read it.
    * Returns (subsetPairs, fullPairs); both materialized small, no
    * cache outlives the call. */
  def minhashCandidatePairsWithSubset(
      df: DataFrame, idCol: String, textCol: String,
      subsetPred: org.apache.spark.sql.Column,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, hotBucketCap: Int = 4096,
      shingleHasher: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column =
        defaultShingleHasher,
      ophDensified: Boolean = false): (DataFrame, DataFrame) = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val src = Fanout.forKernel(df)
    def hashed(rows: DataFrame): DataFrame = rows.select(
      col(idCol), shingleHasher(col(textCol), shingleSize).as("sh"))
    val sigExpr =
      if (ophDensified) T.ophSignature(col("sh"), numHashes)
      else T.minhashSignature(col("sh"), numHashes)
    val sig = hashed(src).select(col(idCol), sigExpr.as("sig"))
    val banded = sig.select(
      col(idCol),
      posexplode(T.bandHashes(col("sig"), numHashes, bands)))
      .select(col(idCol), col("pos").as("band"), col("col").as("bh"))
      .persist(MEMORY_AND_DISK)
    // full-frame capping persists `banded` itself (same object — persist
    // is idempotent), so its cleanup releases the shared kernel cache:
    // sequence the subset's verify BEFORE cleanupAll.
    val (candAll, cleanupAll) =
      cappedBucketPairsLazy(banded, Seq("band", "bh"), idCol, hotBucketCap)
    val (candSub, cleanupSub) = cappedBucketPairsLazy(
      banded.filter(subsetPred), Seq("band", "bh"), idCol, hotBucketCap)
    val sh = hashed(src)
    def verify(cand: DataFrame): DataFrame = cand
      .select(col("id_a"), col("id_b"),
        explode(array(col("id_a"), col("id_b"))).as(idCol))
      .join(sh, Seq(idCol))
      .groupBy(col("id_a"), col("id_b"))
      .agg(
        first(when(col(idCol) === col("id_a"), col("sh")),
          ignoreNulls = true).as("sh_a"),
        first(when(col(idCol) === col("id_b"), col("sh")),
          ignoreNulls = true).as("sh_b"))
      .select(
        col("id_a"), col("id_b"),
        T.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    val outSub = materializeSmall(verify(candSub))
    cleanupSub()
    val outAll = materializeSmall(verify(candAll))
    cleanupAll()
    banded.unpersist(false)
    (outSub, outAll)
  }

  /** Connected components over a verified duplicate-pair set: every row
    * gets the MINIMUM id reachable through any chain of pairs (a~b, b~c
    * ⇒ a,b,c share keeper min(a,b,c)) — full transitive closure, unlike
    * the single-hop [[keeperFrom]].
    *
    * Algorithm, distributed regime: min-label propagation with pointer
    * jumping — each round takes the min over (own label, neighbors'
    * labels, label-of-label), so chains converge in O(log diameter)
    * rounds, and the loop runs to an actual FIXPOINT (zero label changes,
    * one cheap count per round — labels only ever decrease, so the count
    * is exact) rather than a fixed round budget that would silently
    * split long chains. `maxRounds` is a pathological-graph backstop
    * only; hitting it throws rather than returning wrong clusters.
    *
    * `maxDriverEdges` selects the exact driver-side union-find regime
    * (the overwhelmingly common case — the verified-pair set is tiny
    * relative to the corpus by construction); tests force it to 0 to
    * exercise the distributed path. */
  def connectedComponents(
      df: DataFrame, idCol: String, pairs: DataFrame,
      maxRounds: Int = 40, maxDriverEdges: Long = 5000000L): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // undirected edges (both directions), built by exploding per row —
    // NOT a union of two selects, which would duplicate the (expensive)
    // upstream candidate-generation subtree into two computations
    val edges = pairs
      .select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist(MEMORY_AND_DISK)
    // Key scale insight: labels can only change for nodes that touch an
    // edge, and the verified-pair set is tiny relative to the corpus by
    // construction (it IS the duplicates). Two regimes:
    //  - edges fit on the driver (≤ maxDriverEdges, the overwhelmingly
    //    common case): exact union-find with path compression, fully
    //    converged, zero iterative Spark jobs;
    //  - larger: distributed min-label rounds over the subgraph with a
    //    per-round persist — the persist truncates the otherwise
    //    EXPONENTIAL self-referencing plan (labels appears twice per
    //    round) into one cached layer per round.
    val edgeCount = edges.count()
    val labelMap: DataFrame =
      if (edgeCount <= maxDriverEdges) {
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        edges.select(col("src").cast("long"), col("dst").cast("long"))
          .collect().foreach { row =>
            val (a, b) = (find(row.getLong(0)), find(row.getLong(1)))
            if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
          }
        val spark = df.sparkSession
        import spark.implicits._
        parent.keys.toSeq.map(n => (n, find(n))).toDF("node", "label")
      } else {
        // Per-round frames use localCheckpoint, not persist: each round's
        // plan references the previous labels frame TWICE (neighbor min +
        // pointer jump), so with persist the logical plan tree doubles
        // every round — execution stays cached but plan
        // stringification/analysis goes exponential. localCheckpoint
        // truncates the lineage to a leaf, keeping every round's plan
        // constant-size. (Eager: materializes as it cuts.)
        var labels = edges.select(col("src").as("node")).distinct()
          .select(col("node").cast("long").as("node"), col("node").cast("long").as("label"))
          .localCheckpoint()
        var r = 0
        var changed = 1L
        while (changed > 0) {
          if (r >= maxRounds) throw new IllegalStateException(
            s"connectedComponents did not converge in $maxRounds rounds " +
              "(pathological graph?); refusing to return split clusters")
          // min over the labels of every neighbor (propagation) ...
          val neighborMin = edges
            .join(labels.select(col("node").as("dst"), col("label").as("dst_label")), Seq("dst"))
            .groupBy(col("src").as("node"))
            .agg(min(col("dst_label")).as("neighbor_label"))
          // ... and over the label of the current label (pointer jump:
          // halves chain depth each round → O(log diameter) total)
          val pointerJump = labels.select(col("node").as("jn"), col("label").as("jump_label"))
          val joined = labels
            .join(neighborMin, Seq("node"), "left")
            .join(pointerJump, col("label") === col("jn"), "left")
            .select(col("node"), col("label"),
              least(
                col("label"),
                coalesce(col("neighbor_label"), col("label")),
                coalesce(col("jump_label"), col("label"))).as("new_label"))
            .localCheckpoint()
          // labels are monotone non-increasing, so "any row decreased"
          // is an exact fixpoint test
          changed = joined.filter(col("new_label") < col("label")).count()
          labels = joined.select(col("node"), col("new_label").as("label"))
          r += 1
        }
        labels
      }
    // labelMap no longer depends on the edges lineage (driver regime:
    // a driver-built frame; distributed: localCheckpointed), so release
    // the persist NOW — a long-lived caller (the streaming split twin
    // runs this every micro-batch) otherwise leaks one CacheManager
    // entry per batch, and every later action's plan-cache lookup walks
    // all of them (measured r19 as a growing, batch-wide slowdown in
    // StreamStateBench's split mode — the blocks are tiny, the PLANS
    // are not)
    edges.unpersist(false)
    // AQE broadcasts the label map when it is small (the common case)
    df.join(labelMap.select(col("node").as(idCol), col("label")), Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("label"), col(idCol).cast("long")).as("keep_id"))
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

  /** MinHash-LSH near-dedup end to end: one row per input row.
    * `shingleHasher` selects the shingle hash family: the default
    * ShingleHashes64 is the one-pass scale path (q38); the md5-prefix
    * twin (`TextFunctions.md5ShingleHashes`) trades per-row cost for a
    * family DuckDB can replay, putting the WHOLE pipeline — signatures,
    * banding, verification, keeper election — under the hash oracle
    * (q91). */
  def minhashLsh(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7,
      shingleHasher: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column =
        defaultShingleHasher,
      ophDensified: Boolean = false): DataFrame =
    keeperFrom(df, idCol,
      minhashCandidatePairs(df, idCol, textCol, shingleSize, numHashes, bands,
        threshold, shingleHasher = shingleHasher, ophDensified = ophDensified))

  /** Per-row 64-bit SimHash over token hashes (custom single-pass
    * Catalyst expression — see [[graft.functions.SimHash64]]). */
  def simhashes(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    // md5-prefix token hashes (not xxhash64): same voting semantics,
    // but the family is computable by DuckDB too, so q37 carries a
    // full hash oracle — see TextFunctions.md5Hash64
    Fanout.forKernel(df).select(
      col(idCol),
      GraftFunctions.simhash64(
        transform(T.tokens(col(textCol)), t => T.md5Hash64(t))).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, using
    * the banding trick: split the 64-bit hash into `64/(maxHamming+1)`-bit
    * chunks — any pair within the distance budget must agree exactly on
    * at least one chunk (pigeonhole), so candidates come from equi-joins
    * on (chunk_idx, chunk_value), never a cross join. */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, hotBucketCap: Int = 4096): DataFrame =
    hammingPairs(simhashes(df, idCol, textCol), idCol, "simhash",
      maxHamming, hotBucketCap)

  /** Hamming-ball pairs over ANY 64-bit signature column (SimHash,
    * image dHash, …) via the pigeonhole banding trick: candidates from
    * (chunk_idx, chunk_value) equi-joins, exact popcount verify after.
    * Never an all-pairs join; hot buckets capped. */
  def hammingPairs(
      sigs: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int, hotBucketCap: Int = 4096): DataFrame = {
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    // persisted AND populated up front: the signature kernel (decode /
    // simhash votes — the expensive part) runs exactly once; the banded
    // build and both verification rejoins hit the warm cache instead of
    // racing its population inside one action
    val sims = sigs.select(col(idCol), col(hashCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sims.count()
    val chunkCols = (0 until chunks).map { i =>
      shiftrightunsigned(col(hashCol), i * bitsPer)
        .bitwiseAND(lit((1L << bitsPer) - 1))
    }
    val banded = sims.select(
      col(idCol),
      posexplode(array(chunkCols: _*)))
      .select(col(idCol), col("pos").as("chunk"), col("col").as("cv"))
    // candidates flow LAZILY into the popcount verify (never
    // materialized — the unverified set is the big one), one narrow
    // rejoin per side for the hash values; the verified result is
    // pair-grain, materialized so every cache can be freed before
    // returning (no block outlives the call)
    val (cand, bucketCleanup) =
      cappedBucketPairsLazy(banded, Seq("chunk", "cv"), idCol, hotBucketCap)
    val verified = cand
      .join(sims.select(col(idCol).as("id_a"), col(hashCol).as("sim_a")), Seq("id_a"))
      .join(sims.select(col(idCol).as("id_b"), col(hashCol).as("sim_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
    val out = materializeSmall(verified)
    bucketCleanup()
    sims.unpersist(false)
    out
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
    Fanout.forKernel(corpus)
      .withColumn("_block_hash", md5(T.normalizeText(col(textCol))))
      .join(broadcast(bl), Seq("_block_hash"), "left_anti")
      .drop("_block_hash")
  }

  /** FUZZY benchmark decontamination — the near-duplicate analogue of
    * [[decontaminate]] (exact) and [[decontaminateNgrams]] (verbatim
    * n-gram leak): a corpus document is contaminated when its shingle
    * Jaccard against ANY blocklist document reaches `threshold`, found
    * through the same MinHash-LSH banding as [[minhashCandidatePairs]]
    * but run BIPARTITE (corpus bands probe blocklist bands) — the
    * paraphrase/light-edit leak that exact hashes and verbatim 13-grams
    * both miss. Returns the surviving corpus rows unchanged.
    *
    * Scale shape — this is where bipartite beats the self-join: the
    * blocklist is a benchmark suite, thousands of documents against a
    * corpus of billions, so its banded signatures AND its shingle sets
    * are explicitly broadcast. Every stage is then a map-side probe of
    * the streaming corpus: banding join (broadcast), Jaccard verify
    * (broadcast), final left-anti on the contaminated ids (pair-grain,
    * broadcast) — the corpus text NEVER crosses an exchange, and no
    * hot-bucket cap is needed because bucket fan-out is bounded by the
    * blocklist side. The corpus-grain kernel runs twice (banding + the
    * verify rejoin), the [[minhashCandidatePairs]] pipelined-kernel
    * trade, with zero cache footprint. A blocklist too large to
    * broadcast is not this operator's regime — band it against itself
    * with [[minhashCandidatePairs]] machinery instead. */
  def decontaminateFuzzy(
      corpus: DataFrame, idCol: String, textCol: String,
      blocklist: DataFrame, blocklistTextCol: String,
      shingleSize: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5,
      shingleHasher: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column =
        defaultShingleHasher): DataFrame = {
    // blocklist rows get a content-hash id: dedups exact repeats in the
    // suite for free and keeps the operator id-agnostic on that side
    val blockSh = blocklist
      .select(shingleHasher(col(blocklistTextCol), shingleSize).as("_bsh"))
      .withColumn("_bid", xxhash64(col("_bsh")))
      .dropDuplicates("_bid")
    def band(rows: DataFrame, id: String, sh: String): DataFrame = rows
      .select(col(id), posexplode(
        T.bandHashes(T.minhashSignature(col(sh), numHashes), numHashes, bands)))
      .select(col(id), col("pos").as("_band"), col("col").as("_bh"))
    val corpusSh = Fanout.forKernel(corpus)
      .select(col(idCol), shingleHasher(col(textCol), shingleSize).as("_csh"))
    val cand = band(corpusSh, idCol, "_csh")
      .join(broadcast(band(blockSh, "_bid", "_bsh")), Seq("_band", "_bh"))
      .select(col(idCol), col("_bid"))
      .distinct()
    val contaminated = corpusSh
      .join(broadcast(cand), Seq(idCol))
      .join(broadcast(blockSh), Seq("_bid"))
      .filter(T.jaccard(col("_csh"), col("_bsh")) >= threshold)
      .select(col(idCol))
    corpus.join(broadcast(contaminated), Seq(idCol), "left_anti")
  }

  /** [[decontaminate]] for blocklists too big to broadcast. At 100 TB a
    * blocklist can outgrow the broadcast threshold, and the plain
    * left-anti join then shuffles the whole corpus. Instead: one
    * aggregation folds the blocklist hashes into a bloom filter (a few
    * MB of bits regardless of blocklist row count), every corpus row
    * tests it map-side, and only bloom-POSITIVE rows — true matches
    * plus the false-positive sliver — pay the exact anti-join (which
    * Spark may shuffle, but over a tiny input). Definite negatives,
    * i.e. almost the whole corpus, stream through untouched. Results
    * are exactly [[decontaminate]]'s for ANY filter size: the bloom
    * only over-approximates the match set and the exact join corrects
    * it (asserted under a deliberately 64-bit, collision-heavy filter
    * in DedupSpec; oracle-checked as q87). The one driver
    * materialization is the aggregated filter bytes, bounded by
    * `numBits` — same discipline as the IVF centroid broadcast.
    * Spark's own runtime-filter machinery (BloomFilterAggregate /
    * BloomFilterMightContain, the codegen'd expressions behind AQE's
    * injected bloom joins) does the hashing — nothing bespoke. */
  def decontaminateBloom(corpus: DataFrame, textCol: String,
      blocklist: DataFrame, blocklistTextCol: String,
      expectedItems: Long = 1000000L, numBits: Long = 1L << 23): DataFrame = {
    import org.apache.spark.sql.graft.shim
    val bl = blocklist
      .select(md5(T.normalizeText(col(blocklistTextCol))).as("_block_hash"))
      .distinct()
    val bloomBytes = bl.select(shim.column(
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          shim.expression(xxhash64(col("_block_hash"))),
          shim.expression(lit(expectedItems)), shim.expression(lit(numBits)))
          .toAggregateExpression()).as("_bf"))
      .head().getAs[Array[Byte]]("_bf")
    if (bloomBytes == null) return corpus // empty blocklist: nothing to drop
    val bloomF = graft.functions.BloomProbe.deserialize(bloomBytes)
    def mightContain(h: org.apache.spark.sql.Column) =
      graft.functions.BloomProbe(bloomF, xxhash64(h))
    val hashed = Fanout.forKernel(corpus)
      .withColumn("_block_hash", md5(T.normalizeText(col(textCol))))
    hashed.filter(!mightContain(col("_block_hash")))
      .unionByName(
        hashed.filter(mightContain(col("_block_hash")))
          // no broadcast() hint: in the operator's regime the blocklist
          // exceeds the threshold and Catalyst picks a shuffle join over
          // the (tiny) bloom-positive slice; locally it auto-broadcasts,
          // which is equally correct
          .join(bl, Seq("_block_hash"), "left_anti"))
      .drop("_block_hash")
  }

  /** N-GRAM-level decontamination — the industry-standard eval-leak
    * check: a corpus document is contaminated if it shares ANY
    * `n`-token window with a blocklisted document (whole-doc hashing,
    * [[decontaminate]], misses partial quotes). Scale shape: the
    * blocklist's gram hashes are small (|eval| × tokens) → broadcast;
    * the corpus explodes its grams map-side into a broadcast semi join,
    * so the corpus never shuffles — only the matched id set does, and
    * it is tiny by construction.
    *
    * Gram hash family: production default is xxhash64 over the
    * space-joined normalized tokens (codegen'd, no hex materialization
    * — rounds 1-5 paid md5 per gram, 33% of sf1 bench wall-time);
    * `md5Grams = true` switches to md5, the family DuckDB can replay.
    * The OUTPUT is family-invariant — equal grams hash equal under
    * either family and a cross-family collision needs a 64-bit birthday
    * hit inside one corpus's gram set — so q85's md5 oracle stays valid
    * against the xxhash64 production path (equality of the two paths is
    * asserted in DedupSpec). */
  def decontaminateNgrams(
      corpus: DataFrame, idCol: String, textCol: String,
      blocklist: DataFrame, blTextCol: String, n: Int = 13,
      md5Grams: Boolean = false): DataFrame = {
    def gramHashes(c: org.apache.spark.sql.Column) = {
      val emptyType = if (md5Grams) "array<string>" else "array<bigint>"
      // token array bound once as a lambda variable — HOF bodies are
      // interpreted, so a captured split+regex subtree would re-run at
      // every gram position (O(L²) per doc; same fix as T.shingles)
      element_at(
        transform(array(split(T.normalizeText(c), " ")), toks => {
          def gram(p: org.apache.spark.sql.Column) =
            concat_ws(" ", slice(toks, p + lit(1), lit(n)))
          when(size(toks) >= n,
            transform(sequence(lit(0), size(toks) - n),
              p => if (md5Grams) md5(gram(p)) else xxhash64(gram(p))))
            .otherwise(array().cast(emptyType))
        }),
        1)
    }
    val blGrams = blocklist
      .select(explode(gramHashes(col(blTextCol))).as("_g")).distinct()
    val contaminated = Fanout.forKernel(corpus)
      .select(col(idCol), explode(gramHashes(col(textCol))).as("_g"))
      .join(broadcast(blGrams), Seq("_g"), "left_semi")
      .select(col(idCol).as("_cid")).distinct()
    corpus.join(broadcast(contaminated), col(idCol) === col("_cid"), "left_anti")
  }

  /** Deterministic pseudo-random sampling: keep rows whose Knuth-hashed
    * id lands under `percent`. Reproducible across runs/partitionings
    * (no rand()), expressible in plain SQL for oracle checks, and
    * overflow-proof for any id (graft.Exact.hashOrder pre-mods). */
  def deterministicSample(df: DataFrame, idCol: String, percent: Int): DataFrame =
    df.filter(graft.Exact.hashOrder(col(idCol), 100) < percent)

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

  /** Asymmetric CONTAINMENT pairs — the partial-duplicate axis Jaccard
    * misses: a short doc quoted whole inside a long one has tiny
    * Jaccard (union is the long doc) but containment
    * |A∩B| / |A| ≈ 1. The curation move for quote/repost/wrapper
    * detection: flag the SMALLER doc as contained in the larger.
    *
    * Topology is the q171 postings self-join, not any all-pairs form:
    * distinct `ngram`-shingles per doc meet on the shingle key, and the
    * df-share cap (drop shingles in > corpus/maxDfShare docs) bounds
    * the self-join's fan-out by Σ df² over SURVIVING shingles — the
    * text hot-key cap; boilerplate-grade shingles that would pair
    * everything with everything never reach the join. Dropping
    * high-df shingles can only LOWER measured containment, so the
    * threshold reads "containment among distinctive shingles" — the
    * deliberate, scale-safe semantics (same argument as q171's tf·idf
    * weighting).
    *
    * Output: one row per ordered candidate pair, inner = the doc with
    * the smaller distinctive-shingle set (ties by id),
    * `cont_fp` = inter·65536 / sz_inner ≥ `minContainmentFp`.
    * Integer end to end → DuckDB-oracle-checkable (q182).
    *
    * `maxDfAbs` additionally pins the per-shingle pair fan-out to a
    * constant at large corpora (the share cap alone leaves Σ df²
    * quadratic in corpus size); the q182/q191 oracle SQL carries the
    * SAME `df <= 1024` predicate, so engine and reference agree at
    * every scale — including above the cap crossover (~15.4k docs),
    * where the cap actively prunes.
    *
    * The pair aggregate — ~10⁸ mostly-distinct (ia, ib) groups at sf1,
    * the operator's dominant stage — keys on ONE packed long
    * `(ia << 32) | ib` ([[graft.functions.SortedPairsPacked]]) when
    * every id fits in [0, 2³¹) (one scalar min/max rides the corpus
    * count): no per-pair row allocation, 8-byte aggregate keys.
    * Wide-id corpora take canonical struct pairs
    * ([[graft.functions.SortedPairs]]) — measured ~10% slower on the
    * aggregate stage at sf1's 1.1×10⁸ groups and linear either way
    * (an order-preserving dense-id dictionary tier was measured and
    * rejected: its single-partition ranking window plus encode/decode
    * joins cost what the packed keys saved). Both tiers compute
    * identical output. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, maxDfShare: Int = 15,
      minContainmentFp: Long = 6554L, maxDfAbs: Int = DefaultMaxDfAbs): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // The input projection is persisted and POPULATED first — one
    // evaluation of whatever subtree the caller hands in (q191/q192
    // pass a live dedup-join; evaluating that per consumer, with
    // join-estimated stats, was the r14.0 q191 regression) — and its
    // count IS the corpus size the df-share cap needs, so the cap
    // becomes a literal and the former 1-row count cross join
    // disappears. The cache also gives every downstream join exact
    // InMemoryRelation stats instead of join-subtree estimates. The
    // same pass returns the id range — the packed-pair tier guard.
    val src = docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("_t"))
      .persist(MEMORY_AND_DISK)
    val bounds = src.agg(count(lit(1)), min("doc_id"), max("doc_id")).head()
    val nDocs = bounds.getLong(0)
    val packDirect = nDocs > 0 && bounds.getLong(1) >= 0 &&
      bounds.getLong(2) < (1L << 31)
    // ONE shuffle builds the capped posting lists: distinct HASHED
    // shingles per doc ([[T.shingleHashes]] — the one-pass kernel q39
    // gates against the raw-string sets; every count downstream is
    // identical unless the 64-bit hash collides inside the corpus, a
    // statistical non-event for a 0.1-threshold curation signal)
    // explode into (doc_id, s) rows, and a memory-bounded posting
    // aggregate ([[CappedCollect]]) groups them by shingle into
    // struct<df, ds>: the TRUE df plus the id list, capped at
    // maxDfAbs+1 ids so a boilerplate-grade hot shingle costs O(cap)
    // reducer state instead of O(corpus) — every group the caps keep
    // has a COMPLETE list. This replaces the r13 three-pass topology
    // (df groupBy → rare semi-join → two-sided Σ df² self-join), which
    // shuffled the corpus-grain (doc_id, s) frame three more times and
    // emitted BOTH orders of every pair; measured at sf1: 45.3 s → the
    // postings form below.
    //
    // TWO df bounds compose: the SHARE cap defines the semantics
    // ("containment among distinctive shingles" — scale-relative, so
    // the same query stays non-degenerate at every corpus size), and
    // the ABSOLUTE cap `maxDfAbs` pins the per-shingle pair fan-out to
    // a constant (under the share cap alone Σ df² grows quadratically
    // with corpus size — near-cap shingles at df ≈ N/15 dominate). The
    // q182/q191/q194 oracle SQL replays BOTH predicates
    // (`df * 15 <= n AND df <= 1024`), so the caps are part of the
    // defined semantics at every corpus size. Dropping high-df shingles
    // can only LOWER measured containment (the share-cap argument).
    val grouped = src.select(col("doc_id"),
        explode(T.shingleHashes(col("_t"), ngram)).as("s"))
      .groupBy("s")
      .agg(CappedCollect.collectCapped(maxDfAbs + 1)(col("doc_id")).as("g"))
      .filter(col("g.df") * maxDfShare <= lit(nDocs) &&
        col("g.df") <= maxDfAbs)
      .select(col("g.ds").as("ds"))
      .persist(MEMORY_AND_DISK)
    // populated before the fan-out (sizes + pairs) so no consumer races
    // the cache build; the input cache is DEAD once grouped is populated
    // (its only readers were the bounds pass and the shingle explode),
    // so it is freed immediately — peak storage during the pair
    // aggregate must not carry the corpus text (r14: a pass-3 executor
    // OOM at sf1 traced to exactly that). The populate action carries
    // the exact pair volume Σ sz·(sz−1)/2 for the exchange-width gate
    // below — one pass, not a separate probe (a second scan of the
    // cached array column measured ~1 s at sf1 on q191/q192).
    val pairVolume = grouped
      .agg(coalesce(
        sum(expr("CAST(size(ds) AS BIGINT) * (size(ds) - 1) div 2")), lit(0L)))
      .head().getLong(0)
    src.unpersist(false)
    // Sizes count the SAME distinctive universe as the intersection —
    // numerator and denominator stay coherent, so containment 1.0 is
    // reachable.
    val sizes = grouped.select(explode(col("ds")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("sz"))
    // Pair expansion is map-side over the surviving posting lists: each
    // list emits its C(df,2) CANONICAL (ia < ib) pairs — half the
    // df²−df rows the two-sided self-join form shuffled — straight into
    // the pair-grain exchange, the only one in the operator. Packed
    // tier when ids fit; struct tier otherwise.
    //
    // The explicit repartition BYPASSES partial aggregation on the
    // explode side — deliberately. The pair groups are mostly distinct
    // (sf1: 1.38×10⁸ expanded / 1.13×10⁸ distinct — map-side combine
    // recovers only 1.2×), so the partial map is pure overhead, and a
    // structurally harmful one: each explode-side task grows a
    // ~4M-entry aggregation map under 32-way concurrency, tripping the
    // memory manager into sort-based fallback on a cold JVM (measured:
    // 54.6 → 28.3 → 10.6 s across reps for the plain groupBy — q182's
    // cold-cliff mechanism — vs 6.3-7.6 s FLAT with the repartition;
    // min-of-3 at sf1). Shuffle cost trades rows for bytes: raw pairs
    // are 1.2× the combined row count but half the record width
    // (8-byte key vs key+count), and both aggregates then run
    // back-to-back on clustered partitions with no second exchange.
    // On corpora where pairs DO repeat heavily (replica cliques) the
    // raw shuffle would grow with the repetition ratio — but the
    // production sequence (q191/q192) runs containment AFTER near-dedup
    // precisely so replica cliques never reach this operator.
    //
    // Exchange WIDTH: on a big corpus the distinct-pair count dwarfs
    // the row count (sf1: 1.13e8 pairs from 5e4 docs), so at the
    // session default of one partition per core each reducer's
    // aggregation map holds pairs/cores entries -- the allocator/GC
    // pressure behind the measured cold-run cliff. 8x the default
    // parallelism cuts the per-task map 8-fold and runs the aggregate
    // in waves of small tasks: q182@sf1 dedicated-run median 47.6 ->
    // 18-24 s (min-of-3 ladder: 1x = 33.4 min, 4x = 19.1, 8x =
    // 16.3-18.7, 16x = 16.7 min but worse median) -- 8x is the knee.
    // Gated on the TRUE pair volume, not a corpus-size proxy: the
    // postings are already cached, so one vocabulary-grain pass sums
    // sz·(sz−1)/2 exactly — q191/q192 run containment after near-dedup
    // with 10³× smaller pair volumes than q182 over the same corpus
    // size, and must not pay hundreds of near-empty tasks.
    val defaultWidth = src.sparkSession.sessionState.conf.numShufflePartitions
    val pairWidth =
      if (pairVolume / defaultWidth > 1000000L)
        8 * src.sparkSession.sparkContext.defaultParallelism
      else defaultWidth
    val inter =
      if (packDirect)
        grouped.select(explode(T.sortedPairsPacked(col("ds"))).as("pk"))
          .repartition(pairWidth, col("pk"))
          .groupBy("pk").agg(count(lit(1)).as("inter"))
          .select(shiftrightunsigned(col("pk"), 32).as("ia"),
            col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("ib"), col("inter"))
      else
        grouped.select(explode(T.sortedPairs(col("ds"))).as("p"))
          .select(col("p.a").as("ia"), col("p.b").as("ib"))
          .repartition(pairWidth, col("ia"), col("ib"))
          .groupBy("ia", "ib").agg(count(lit(1)).as("inter"))
    // inner = the doc with the smaller distinctive-shingle set (ties by
    // id — ia < ib is canonical, so the tie keeps ia, matching the
    // two-sided form's `sz_a < sz_b OR (= AND ia < ib)` row filter)
    val scored = inter
      .join(sizes.select(col("doc_id").as("ia"), col("sz").as("sz_a")), "ia")
      .join(sizes.select(col("doc_id").as("ib"), col("sz").as("sz_b")), "ib")
      .select(
        when(col("sz_a") <= col("sz_b"), col("ia")).otherwise(col("ib"))
          .as("inner_id"),
        when(col("sz_a") <= col("sz_b"), col("ib")).otherwise(col("ia"))
          .as("outer_id"),
        col("inter"),
        least(col("sz_a"), col("sz_b")).as("sz_inner"),
        greatest(col("sz_a"), col("sz_b")).as("sz_outer"))
      .withColumn("cont_fp", expr("inter * 65536 div sz_inner"))
      .filter(col("cont_fp") >= minContainmentFp)
    val result = scored
      .select("inner_id", "outer_id", "inter", "sz_inner", "sz_outer",
        "cont_fp")
    // pair-grain result materialized eagerly so the last cache (grouped
    // — src was already freed at its last use above) can be released
    // before returning — the header's cache-lifetime contract
    val out = materializeSmall(result)
    grouped.unpersist(false)
    out
  }

  /** Sub-document (paragraph/chunk) dedup signal — the CCNet/Dolma-style
    * "duplicated paragraph fraction" quality feature. Documents are cut
    * into fixed `chunkTokens`-token chunks (the synthetic corpus has no
    * newline paragraph breaks, so the chunk grid stands in for paragraph
    * boundaries; with real text, swap the splitter for split on \n\n and
    * nothing else changes); the first occurrence corpus-wide (min of an
    * order-encoded (doc_id, chunk_idx)) is the keeper and every later
    * occurrence counts as duplicated. Returns one row per document:
    * (id, n_chunks, n_dup).
    *
    * Scale shape (r14 rewrite — aggregates only, NO window): the
    * original window-over-chunk-hash form buffered every instance of a
    * hash in ONE window partition — a universal boilerplate chunk puts
    * its whole corpus-wide row set (text included) through a single
    * reducer at 100 TB. Instead: a doc's non-duplicated count equals
    * the number of hash groups whose keeper (min encoded instance) it
    * owns, so three partial-combinable aggregates suffice — per-hash
    * MIN (a hot chunk pre-combines to one row per map task), keeper
    * counts decoded back to doc grain, and per-doc totals — joined at
    * doc grain. The chunk text never crosses an exchange (only the
    * md5 and the encoded position do) where the window form shuffled
    * full instance rows. The id×1e6 order encoding requires
    * chunk_idx < 1e6, i.e. docs under ~chunkTokens·1e6 tokens — cheap
    * insurance vs carrying a struct ordering that the DuckDB oracle
    * can't replay. */
  def chunkDupStats(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 10): DataFrame = {
    val chunks = chunkGrid(textCol, chunkTokens)
    val encoded = col(idCol) * 1000000L + col("chunk_idx")
    val rows = Fanout.forKernel(df)
      .select(col(idCol), posexplode(chunks).as(Seq("chunk_idx", "chunk")))
      .select(col(idCol), encoded.as("_enc"), md5(col("chunk")).as("_ch"))
    // integer div, not `/`: encoded reaches id·10⁶ ≈ 2⁵⁷ at wide id
    // layouts — double division would lose low bits past 2⁵³
    val keeperOwned = rows.groupBy(col("_ch"))
      .agg(min(col("_enc")).as("_k"))
      .groupBy(expr("_k div 1000000").as(idCol))
      .agg(count(lit(1)).as("_n_keep"))
    rows.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"))
      .join(keeperOwned, Seq(idCol), "left") // a doc can own zero keepers
      .select(col(idCol), col("n_chunks"),
        (col("n_chunks") - coalesce(col("_n_keep"), lit(0L))).as("n_dup"))
  }

  /** The fixed-grid chunk array shared by the chunk-grain operators:
    * `chunkTokens`-token chunks over the whitespace token stream, last
    * chunk short. Bound once per caller (interpreted HOF bodies
    * re-evaluate captured subtrees per element — the gramHashes
    * discipline). */
  private def chunkGrid(textCol: String, chunkTokens: Int) =
    element_at(
      transform(array(split(col(textCol), " ")), toks => {
        val nChunks = ceil(size(toks) / lit(chunkTokens.toDouble)).cast("int")
        transform(
          sequence(lit(0), nChunks - 1),
          i => array_join(slice(toks, i * chunkTokens + 1, lit(chunkTokens)), " "))
      }),
      1)

  /** Cross-document duplicated-chunk SCRUB — the RefinedWeb/Dolma
    * "remove duplicated spans from the text" pass that [[chunkDupStats]]
    * only measures. Documents are cut into the same fixed
    * `chunkTokens`-token grid; a chunk whose content occurs in at least
    * `minDocs` DISTINCT documents is boilerplate and is removed from
    * EVERY document (the symmetric mass-removal form, so the result is
    * independent of document order); the output is one row per document
    * with the surviving text re-joined in chunk order:
    * (id, text_scrubbed, n_chunks, n_removed).
    *
    * Scale shape: the chunk kernel (split + slice — cheap, codegen'd)
    * runs twice, once under the document-frequency aggregate and once
    * under the rejoin; persisting a corpus-sized chunk frame to save a
    * cheap kernel is the measured losing trade (SCALING.md, pre-count
    * crossover). The df aggregate is COUNT(DISTINCT doc) keyed on the
    * chunk hash — Spark's two-phase distinct rewrite keys the heavy
    * exchange on (hash, doc), near-unique pairs, so a chunk present in
    * EVERY document still spreads across all reducers ([[chunkDupStats]]'
    * window-over-hash form would park that chunk's whole corpus-wide
    * row set in one window partition — fine for its doc-grain stats at
    * tested scales, fatal for a scrub that must carry chunk text). The
    * banned set rejoins on the hash with NO broadcast hint: its size is
    * data-dependent (boilerplate-grain — small on real corpora, where
    * AQE broadcasts it; potentially huge on a pathological one, where
    * the equi-join shuffles and still scales). One final exchange
    * groups kept chunks back to document grain — the same exchange any
    * exact-dedup pass pays. */
  def chunkScrub(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 10, minDocs: Int = 2): DataFrame = {
    val rows = Fanout.forKernel(df)
      .select(col(idCol), posexplode(chunkGrid(textCol, chunkTokens))
        .as(Seq("chunk_idx", "chunk")))
      .withColumn("_ch", md5(col("chunk")))
    val banned = rows.groupBy(col("_ch"))
      .agg(countDistinct(col(idCol)).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select(col("_ch"), lit(1L).as("_banned"))
    rows.join(banned, Seq("_ch"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(col("_banned").isNull,
                struct(col("chunk_idx"), col("chunk"))))),
            s => s.getField("chunk")),
          " ").as("text_scrubbed"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("_banned").isNotNull, 1L).otherwise(0L)).as("n_removed"))
  }

  /** WITHIN-document repeated-chunk dedup (Dolma's paragraph-dedupe
    * pass): on the same fixed `chunkTokens`-token grid, keep each
    * chunk's FIRST occurrence inside its own document and drop later
    * repeats, re-joining survivors in order — the map-side complement
    * of [[chunkScrub]]'s corpus-level removal. Output one row per
    * document: (id, text_deduped, n_chunks, n_dup).
    *
    * Scale shape: ZERO exchanges at any scale (asserted in DedupSpec) —
    * the whole operator is a projection of array HOFs riding the scan,
    * so it composes with any downstream pass for free. The first-
    * occurrence filter is O(k²) in k = chunks per document (each chunk
    * probes the prefix before it); at the paragraph grain of real
    * corpora k is O(100), and the pathological million-token document
    * is exactly what the length/quality filters (q33/q121) drop before
    * this pass runs. */
  def docChunkDedup(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 10): DataFrame =
    df.select(col(idCol), chunkGrid(textCol, chunkTokens).as("_chunks"))
      .select(col(idCol), col("_chunks"),
        filter(col("_chunks"), (c, i) =>
          array_position(slice(col("_chunks"), lit(1), i), c) === lit(0L))
          .as("_kept"))
      .select(
        col(idCol),
        array_join(col("_kept"), " ").as("text_deduped"),
        size(col("_chunks")).cast("long").as("n_chunks"),
        (size(col("_chunks")) - size(col("_kept"))).cast("long").as("n_dup"))

  /** Substring-level exact dedup — the suffix-array regime (repeated
    * long substrings ACROSS documents: boilerplate headers, license
    * text, templated pages; Lee et al. 2022's "deduplicating training
    * data" staple) that document- (dedupExact), chunk-grid-
    * (chunkDupStats) and near- (minhash) grain all miss or blur.
    * A fixed chunk grid masks repeats that straddle grid lines; here
    * boundaries are CONTENT-DEFINED ([[graft.functions.CdcChunks]]):
    * rolling-hash anchors mean two copies of the same substring chunk
    * identically no matter where they sit in their documents, so repeat
    * interiors align on chunk equality alone. Per document the output
    * is each maximal run of chunks whose content occurs elsewhere in
    * the corpus (≥ 2 occurrences corpus-wide, same-document repeats
    * included), reported when the run covers ≥ `minLen` code points:
    * (doc_id, span_start, span_len, n_chunks), 1-based SQL addressing.
    * Resolution: a repeat shorter than ~2 expected chunk lengths may
    * contain no full chunk and go unreported, and up to one partial
    * chunk at each end of a longer repeat is cropped — the standard
    * CDC trade; shrink `p` (expected chunk length) for finer grain at
    * more chunk rows.
    *
    * Scale shape: the chunk frame carries (id, start, len, md5) — the
    * text itself never leaves the scan projection. ONE hash exchange on
    * the chunk hash (duplicate flagging via COUNT over the hash window,
    * the chunkDupStats discipline), then one exchange on the doc id
    * that both the run-merge window and the final span aggregate reuse.
    * No joins, no driver state, no global window. */
  def substringDups(
      df: DataFrame, idCol: String, textCol: String,
      minLen: Int = 80, w: Int = 8, p: Int = 32): DataFrame = {
    import graft.functions.{TextFunctions => T}
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("_start"))
    val chunks = Fanout.forKernel(df)
      .select(col(idCol), col(textCol).as("_t"),
        posexplode(T.cdcChunks(col(textCol), w, p)))
      .select(col(idCol), col("col.start").as("_start"), col("col.len").as("_len"),
        md5(expr("substring(_t, col.start, col.len)")).as("_ch"))
    // duplicate flagging as a SEMI-join against the hash-grain count
    // table, not a COUNT() window over the hash (r14 rewrite): the
    // window form buffers every instance of a hash in one partition —
    // a corpus-universal boilerplate chunk is a single-reducer stage
    // at 100 TB — while the join form pre-combines counts map-side and
    // STREAMS the instance rows through the probe (AQE skew-split
    // applies if the hot hash's probe volume itself skews)
    val dupHashes = chunks.groupBy(col("_ch"))
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") > 1)
      .select(col("_ch"))
    chunks
      .join(dupHashes, Seq("_ch"), "left_semi")
      // chunks are contiguous within a doc, so a surviving chunk starts
      // a new run exactly when the previous survivor doesn't end at it
      .withColumn("_brk",
        when(col("_start") === lag(col("_start") + col("_len"), 1).over(byDoc), 0L)
          .otherwise(1L))
      .withColumn("_run", sum(col("_brk")).over(
        byDoc.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("_run"))
      .agg(
        min(col("_start")).cast("long").as("span_start"),
        sum(col("_len")).cast("long").as("span_len"),
        count(lit(1)).as("n_chunks"))
      .filter(col("span_len") >= minLen)
      .select(col(idCol), col("span_start"), col("span_len"), col("n_chunks"))
  }

  /** CROSS-DOCUMENT exact-substring dedup at EVERY token alignment —
    * the Lee et al. 2022 ("Deduplicating Training Data Makes Language
    * Models Better") ExactSubstr pass: report, per document, the
    * maximal token spans whose every `window`-token substring occurs
    * verbatim in ≥ `minDocs` distinct documents. This closes the two
    * alignment gaps the other substring passes leave: [[chunkScrub]]'s
    * fixed grid misses a duplicate straddling a grid line (a 50-token
    * copy split 30/20 across two chunks bans neither), and
    * [[substringDups]]' content-defined chunks crop up to one partial
    * chunk at each end and miss repeats shorter than ~2 expected chunk
    * lengths. Here the fingerprint grid is every position's
    * `window`-token md5 hash (the paper's suffix-array join at a fixed
    * match length, expressed relationally), so ANY cross-doc repeat of
    * ≥ window tokens is caught exactly, at any offset. Output:
    * (idCol, span_start, span_len, n_windows), token coordinates,
    * 1-based; span_len = tokens covered by the flagged run.
    *
    * Scale shape: the postings frame is corpus-TOKEN-grain — one row
    * per window position, the inherent cost of all-alignment substring
    * dedup (the paper pays it as a suffix-array sort; one hash
    * exchange here). The cross-doc test is COUNT(DISTINCT doc) keyed
    * on the window hash — Spark's two-phase distinct rewrite keys the
    * heavy exchange on (hash, doc), so a corpus-universal boilerplate
    * window (df = |corpus|) still spreads across reducers; the flagged
    * set rejoins as a semi join (map-combined build side, AQE
    * skew-split on the probe). Span assembly is one doc-partitioned
    * window (never global). No pair set is ever emitted — the output
    * is doc-grain spans, so there is no quadratic regime at any df,
    * unlike containment's Σ C(df,2). md5-prefix hash family →
    * DuckDB-replayable end to end (q213). */
  def exactSubstrSpans(df: DataFrame, idCol: String, textCol: String,
      window: Int = 50, minDocs: Int = 2): DataFrame = {
    import graft.functions.{TextFunctions => T}
    require(window >= 1 && minDocs >= 2)
    val wins = Fanout.forKernel(df)
      .select(col(idCol), T.tokens(col(textCol)).as("_t"))
      .filter(size(col("_t")) >= window)
      .select(col(idCol), posexplode(
        transform(sequence(lit(1), size(col("_t")) - window + 1),
          i => T.md5Hash64(concat_ws(" ", slice(col("_t"), i, lit(window)))))))
      .select(col(idCol), (col("pos") + 1).as("_p"), col("col").as("_h"))
    val dupH = wins.groupBy(col("_h"))
      .agg(countDistinct(col(idCol)).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select(col("_h"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("_p"))
    wins.join(dupH, Seq("_h"), "left_semi")
      // flagged positions are strictly increasing per doc, so p - rank
      // is constant exactly along each maximal consecutive run
      .withColumn("_run", col("_p") - row_number().over(byDoc))
      .groupBy(col(idCol), col("_run"))
      .agg(
        min(col("_p")).cast("long").as("span_start"),
        (max(col("_p")) - min(col("_p")) + window).cast("long").as("span_len"),
        count(lit(1)).as("n_windows"))
      .select(col(idCol), col("span_start"), col("span_len"), col("n_windows"))
  }

  /** The SCRUB half of [[exactSubstrSpans]] — Lee et al. 2022's actual
    * dedup action, not just the report: CUT every cross-document
    * exact-substring span from all but one copy. Per duplicated
    * `window`-token fingerprint the KEEPER is the minimum doc id
    * holding it (keep-one-copy — the paper removes all but the first
    * occurrence in suffix-array order; min-id is the deterministic
    * relational analogue); every flagged position outside its keeper
    * doc merges into maximal runs exactly as in [[exactSubstrSpans]],
    * and the covered tokens are dropped. This closes the curation gap
    * the r17 verdict named: [[chunkScrub]]'s fixed grid misses a
    * duplicate straddling a grid line, so boundary-straddling
    * boilerplate still shipped in the curated export
    * ([[graft.pipeline.CurationChain]]'s substr variant wires this in;
    * DedupSpec plants exactly that miss).
    *
    * Output one row per input document, TOKEN space (the normalized
    * [[graft.functions.TextFunctions.tokens]] grain the fingerprints
    * are computed over): (idCol, text_scrubbed, n_tokens, n_removed).
    * Documents shorter than `window` tokens pass through verbatim
    * (normalized); within-keeper repeats are [[exactSubstrScrubAll]]'s
    * (q215) unified census, or q198's chunk-grid docChunkDedup.
    *
    * Scale shape: identical to [[exactSubstrSpans]] — token-grain
    * postings, two-phase distinct census (plus a min(doc) riding the
    * same aggregate), semi-shaped join back, doc-partitioned run
    * window; NO pair emission at any df. The reconstruction joins the
    * doc-grain span list (bounded per doc) back to the token arrays
    * and drops covered tokens with an array HOF riding the scan — the
    * text is scanned twice (fingerprints, reconstruction), never
    * shuffled at token grain with its payload. md5-prefix hash family
    * → DuckDB-replayable end to end (q214). */
  def exactSubstrScrub(df: DataFrame, idCol: String, textCol: String,
      window: Int = 50, minDocs: Int = 2): DataFrame = {
    require(window >= 1 && minDocs >= 2)
    val (toks, wins) = substrWindows(df, idCol, textCol, window)
    val dupH = wins.groupBy(col("_h"))
      .agg(countDistinct(col(idCol)).as("_nd"), min(col(idCol)).as("_keep"))
      .filter(col("_nd") >= minDocs)
      .select(col("_h"), col("_keep"))
    val flagged = wins.join(dupH, Seq("_h"))
      .filter(col(idCol) =!= col("_keep"))
      .select(col(idCol), col("_p"))
    scrubFlagged(toks, flagged, idCol, window)
  }

  /** [[exactSubstrScrub]] extended to WITHIN-document repeats — the
    * full Lee et al. 2022 semantic: a suffix array finds ANY repeated
    * ≥-length substring, including a document repeating its own
    * boilerplate, and keeps only the FIRST occurrence in suffix order.
    * Here the census flags every `window`-token fingerprint occurring
    * ≥ `minCopies` times ANYWHERE (same doc or across docs) and keeps
    * the single occurrence with the minimum (doc id, position) — the
    * deterministic relational analogue of first-in-suffix-order; every
    * other occurrence's flagged positions merge into maximal runs and
    * their tokens are cut. [[exactSubstrScrub]] (q214) remains the
    * cross-doc-only form (its keeper keeps ALL its copies — the
    * `minDocs` distinct-doc census cannot see within-doc repeats); this
    * variant (q215) is what [[graft.pipeline.CurationChain
    * .curateSubstr]]'s `withinDoc` flag composes, closing the r18
    * verdict note that a doc repeating its own boilerplate shipped it
    * N times in the substr export.
    *
    * Scale shape: identical to [[exactSubstrScrub]] — the census
    * aggregate carries a min(struct(doc, pos)) instead of min(doc),
    * same single hash exchange, no pair emission. */
  def exactSubstrScrubAll(df: DataFrame, idCol: String, textCol: String,
      window: Int = 50, minCopies: Int = 2): DataFrame = {
    require(window >= 1 && minCopies >= 2)
    val (toks, wins) = substrWindows(df, idCol, textCol, window)
    val dupH = wins.groupBy(col("_h"))
      .agg(count(lit(1)).as("_n"),
        min(struct(col(idCol).as("_kd"), col("_p").as("_kp"))).as("_first"))
      .filter(col("_n") >= minCopies)
      .select(col("_h"), col("_first"))
    val flagged = wins.join(dupH, Seq("_h"))
      .filter(!(col(idCol) === col("_first").getField("_kd") &&
        col("_p") === col("_first").getField("_kp")))
      .select(col(idCol), col("_p"))
    scrubFlagged(toks, flagged, idCol, window)
  }

  /** Shared fingerprint grid of the ExactSubstr scrubs: (normalized
    * token arrays, one md5-window row per position). */
  private def substrWindows(df: DataFrame, idCol: String, textCol: String,
      window: Int): (DataFrame, DataFrame) = {
    import graft.functions.{TextFunctions => T}
    val toks = Fanout.forKernel(df)
      .select(col(idCol), T.tokens(col(textCol)).as("_t"))
    val wins = toks.filter(size(col("_t")) >= window)
      .select(col(idCol), posexplode(
        transform(sequence(lit(1), size(col("_t")) - window + 1),
          i => T.md5Hash64(concat_ws(" ", slice(col("_t"), i, lit(window)))))))
      .select(col(idCol), (col("pos") + 1).as("_p"), col("col").as("_h"))
    (toks, wins)
  }

  /** Shared scrub tail: merge flagged positions into maximal runs per
    * doc, widen each run by the window length, and cut the covered
    * tokens with an array HOF riding the reconstruction scan. */
  private def scrubFlagged(toks: DataFrame, flagged: DataFrame,
      idCol: String, window: Int): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("_p"))
    val spans = flagged
      .withColumn("_run", col("_p") - row_number().over(byDoc))
      .groupBy(col(idCol), col("_run"))
      .agg(min(col("_p")).as("_s"), (max(col("_p")) + window - 1).as("_e"))
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("_s"), col("_e"))).as("_spans"))
    toks.join(spans, Seq(idCol), "left")
      .withColumn("_kept", when(col("_spans").isNull, col("_t"))
        .otherwise(filter(col("_t"), (_, i) =>
          !exists(col("_spans"), s =>
            (i + 1) >= s.getField("_s") && (i + 1) <= s.getField("_e")))))
      .select(
        col(idCol),
        array_join(col("_kept"), " ").as("text_scrubbed"),
        size(col("_t")).cast("long").as("n_tokens"),
        (size(col("_t")) - size(col("_kept"))).cast("long").as("n_removed"))
  }
}
