package graft.queries

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval over the documents corpus (round 12): inverted
  * index construction and fixed-point BM25 ranking — the query-based
  * curation surface (pull topical slices out of a crawl, filter
  * stopwords/hapaxes by dictionary statistics). Backed by
  * [[graft.operators.Search]]; every query is hash-oracled in DuckDB
  * because the scoring is integer end to end.
  */
object Retrieval {

  /** DuckDB twin of [[graft.functions.TextFunctions.tokens]] (same
    * string as Analytics.tokensSql — the catalog-wide convention). */
  private val tokensSql: String =
    """string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')"""

  /** DuckDB twin of TextFunctions.shingles over alias `t` (the
    * Analytics.shinglesSql convention). */
  private def shinglesSql(n: Int): String = s"""
    CASE WHEN len(t) < $n THEN [array_to_string(t, ' ')]
         ELSE list_transform(generate_series(1, len(t) - ${n - 1}),
                p -> array_to_string(t[p:p+${n - 1}], ' ')) END"""

  /** DuckDB twin of [[graft.operators.Search.log2FpExpr]]. */
  private def log2FpSql(x: String): String = {
    val msb = s"(length(bin(CAST($x AS BIGINT))) - 1)"
    val pow = s"(CAST(1 AS BIGINT) << $msb)"
    s"(CAST($msb AS BIGINT) * 65536 + ((($x) - $pow) * 65536) // $pow)"
  }

  /** The fixed retrieval workload: three queries mixing common and
    * rare vocabulary, shared verbatim by engine and oracle. */
  private val queryTerms: Seq[(Int, String)] = Seq(
    0 -> "spark", 0 -> "window", 0 -> "agg",
    1 -> "hash", 1 -> "join", 1 -> "customer",
    2 -> "stream", 2 -> "vector", 2 -> "the")

  private val queryValuesSql: String =
    queryTerms.map { case (q, t) => s"($q, '$t')" }.mkString(", ")

  /** The q187 evaluation workload: every query carries the corpus's
    * one genuinely rare term ("dup", df ≈ 5% of docs) so the AND-match
    * grades actually vary — with common-only terms every document
    * grades maximal and nDCG degenerates to 1.0 for any ranking,
    * gating nothing. */
  private val evalTerms: Seq[(Int, String)] = Seq(
    0 -> "spark", 0 -> "window", 0 -> "dup",
    1 -> "hash", 1 -> "dup", 1 -> "customer",
    2 -> "vector", 2 -> "dup", 2 -> "the")

  private val evalValuesSql: String =
    evalTerms.map { case (q, t) => s"($q, '$t')" }.mkString(", ")

  /** The fixed phrase workload (phrase_id, 0-based slot idx, term) —
    * phrase 2 repeats a term to exercise the multi-slot vote path. */
  private val phraseTerms: Seq[(Int, Int, String)] = Seq(
    (0, 0, "value"), (0, 1, "table"),
    (1, 0, "fast"), (1, 1, "spark"),
    (2, 0, "table"), (2, 1, "table"),
    (3, 0, "scan"), (3, 1, "query"), (3, 2, "big"))

  private val phraseValuesSql: String =
    phraseTerms.map { case (p, i, t) => s"($p, $i, '$t')" }.mkString(", ")

  /** The fixed proximity workload (pair_id, term_a, term_b). */
  private val pairTerms: Seq[(Int, String, String)] = Seq(
    (0, "spark", "window"), (1, "customer", "query"), (2, "vector", "stream"))

  private val pairValuesSql: String =
    pairTerms.map { case (p, a, b) => s"($p, '$a', '$b')" }.mkString(", ")

  def specs: Seq[QuerySpec] = Seq(

    // ---- q163: inverted-index dictionary statistics — document
    // frequency, collection frequency, max tf per token. The postings
    // build is ONE corpus shuffle keyed by (token, doc) with map-side
    // combine (text never moves after tokenize); the dictionary reduce
    // is vocabulary-grain. This is the stopword/hapax-filter profile a
    // curation pass runs before indexing a 100 TB crawl. ----
    QuerySpec(
      "q163_inverted_postings",
      Some(s"""
        WITH toks AS (
          SELECT doc_id, unnest($tokensSql) AS token FROM documents),
        tf AS (
          SELECT token, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2)
        SELECT token, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
               MAX(tf) AS max_tf
        FROM tf GROUP BY token"""),
      (s, dir) =>
        graft.operators.Search.indexStats(
          Tables.load(s, dir, "documents"), "doc_id", "text")),

    // ---- q164: BM25 top-10 per query, FIXED-POINT INTEGER scoring —
    // k1=1.2, b=0.75, Lucene's positivity idf, log2 at 16 fractional
    // bits via exact bit-length arithmetic, tf-normalization with
    // cleared denominators (every term scaled by 10·L). Integer end to
    // end means bit-identical ranking across engines and platforms (no
    // float drift between a laptop and a 1000-executor cluster), which
    // is what lets the oracle replay the scores exactly rather than
    // settling for a rows-only check. The query-term table broadcasts
    // into the postings scan, so only documents containing a query
    // term survive to the doc-length join; df and the (N, L) scalars
    // ride as broadcasts (the 1-row stats cross join is the q20
    // pattern). Ties kept by rank(), broken-for-order by doc id. ----
    QuerySpec(
      "q164_bm25_topk",
      Some(s"""
        WITH toks AS (
          SELECT doc_id, unnest($tokensSql) AS token FROM documents),
        tf AS (
          SELECT token, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        dl AS (
          SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
        stats AS (
          SELECT (SELECT COUNT(*) FROM documents) AS n,
                 (SELECT CAST(SUM(tf) AS BIGINT) FROM tf) AS l),
        qt AS (
          SELECT * FROM (VALUES $queryValuesSql) AS v(query_id, term)),
        dfq AS (
          SELECT token, COUNT(*) AS df FROM tf
          WHERE token IN (SELECT term FROM qt) GROUP BY token),
        contrib AS (
          SELECT qt.query_id, tf.doc_id,
                 (${log2FpSql("2*n + 2")} - ${log2FpSql("2*df + 1")})
                   * (tf * 22 * l) // (10 * l * tf + 3 * l + 9 * dl * n) AS c
          FROM tf
          JOIN qt ON qt.term = tf.token
          JOIN dfq ON dfq.token = tf.token
          JOIN dl ON dl.doc_id = tf.doc_id
          CROSS JOIN stats),
        scores AS (
          SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS score_fp
          FROM contrib GROUP BY 1, 2)
        SELECT query_id, doc_id, score_fp, rk FROM (
          SELECT query_id, doc_id, score_fp,
                 rank() OVER (PARTITION BY query_id
                              ORDER BY score_fp DESC, doc_id) AS rk
          FROM scores) r
        WHERE rk <= 10"""),
      (s, dir) => {
        import s.implicits._
        val queries = queryTerms.toDF("query_id", "term")
        graft.operators.Search.bm25TopK(
          Tables.load(s, dir, "documents"), "doc_id", "text", queries, k = 10)
          .select(col("query_id"), col("doc_id"), col("score_fp"),
            col("rk").cast("long").as("rk"))
      }),

    // ---- q169: incremental inverted-index maintenance — the q147
    // rollup discipline applied to the search index. The engine builds
    // the dictionary from the 90% "at-rest" corpus, the 10% nightly
    // delta separately, and MERGES at vocabulary grain (df/cf additive
    // across disjoint doc sets, max_tf a max): the delta is the only
    // text scanned; the base collapses to its vocabulary-grain index
    // before the merge, exactly what a nightly job reads back from
    // disk. The oracle recomputes the FULL dictionary from scratch, so
    // the hash gate proves incremental == recompute. ----
    QuerySpec(
      "q169_postings_incremental",
      Some(s"""
        WITH toks AS (
          SELECT doc_id, unnest($tokensSql) AS token FROM documents),
        tf AS (
          SELECT token, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2)
        SELECT token, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
               MAX(tf) AS max_tf
        FROM tf GROUP BY token"""),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val base = graft.operators.Search.indexStats(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
        val delta = graft.operators.Search.indexStats(
          docs.filter(col("doc_id") % 10 === 0), "doc_id", "text")
        graft.operators.Search.mergeIndexStats(base, delta)
      }),

    // ---- q171: "more like this" — top-5 most similar documents per
    // anchor via the postings SELF-join (the related-articles /
    // topical-dedup topology). Documents are tf·idf vectors over word
    // BIGRAMS (the unigram vocab is 31 near-stopwords — bigrams give
    // 900+ terms with df ≈ corpus/15, the selectivity a real corpus's
    // tail provides for free) in the q164 fixed point; similarity is
    // the integer dot over shared terms. Scale bounds, both in the
    // plan: the df cap is a SHARE of the corpus (keep df·15 ≤ N — an
    // absolute cap degenerates at 10× scale; a df-doc term costs df²
    // pair terms, the text world's hot-key cap), and the anchor set
    // (doc_id < 25) bounds the broadcast side; the corpus side streams
    // by term. Ties kept by rank(), broken-for-order by sim id. ----
    QuerySpec(
      "q171_more_like_this",
      Some(s"""
        WITH toksl AS (
          SELECT doc_id, $tokensSql AS t FROM documents),
        toks AS (
          SELECT doc_id, unnest(${shinglesSql(2)}) AS token FROM toksl),
        tf AS (
          SELECT token, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        nn AS (SELECT COUNT(*) AS n FROM documents),
        dft AS (
          SELECT token, df,
                 (${log2FpSql("2*n + 2")} - ${log2FpSql("2*df + 1")}) AS idf_fp
          FROM (SELECT token, COUNT(*) AS df FROM tf GROUP BY token) d
          CROSS JOIN nn
          WHERE df * 15 <= n),
        wp AS (
          SELECT tf.token, tf.doc_id, tf.tf * dft.idf_fp AS w
          FROM tf JOIN dft USING (token)),
        ap AS (
          SELECT token, doc_id AS adoc, w AS aw FROM wp WHERE doc_id < 25),
        scored AS (
          SELECT ap.adoc AS doc_id, wp.doc_id AS sim_id,
                 CAST(SUM(wp.w * ap.aw) AS BIGINT) AS dot_fp
          FROM wp JOIN ap USING (token)
          WHERE wp.doc_id <> ap.adoc
          GROUP BY 1, 2)
        SELECT doc_id, sim_id, dot_fp, rk FROM (
          SELECT doc_id, sim_id, dot_fp,
                 rank() OVER (PARTITION BY doc_id
                              ORDER BY dot_fp DESC, sim_id) AS rk
          FROM scored) r
        WHERE rk <= 5"""),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val anchors = docs.filter(col("doc_id") < 25).select(col("doc_id"))
        graft.operators.Search.moreLikeThis(docs, "doc_id", "text",
            anchors, k = 5, maxDfShare = 15, ngram = 2)
          .select(col("doc_id"), col("sim_id"), col("dot_fp"),
            col("rk").cast("long").as("rk"))
      }),

    // ---- q175: exact PHRASE search over the positional index — the
    // vote decomposition: each posting matching phrase slot idx votes
    // for candidate start pos−idx; a start with m votes is a full
    // occurrence. ONE broadcast join (phrase terms are query-sized) +
    // one aggregate keyed by (phrase, doc, start) — never an m-way
    // postings self-join, which is how naive phrase search dies at
    // scale (m−1 position joins replaced by a vote count). Phrase 2
    // repeats a term ("table table"), exercising the multi-slot vote
    // path. Top-10 docs per phrase by occurrence count; ties kept by
    // rank(), broken-for-order by doc id. ----
    QuerySpec(
      "q175_phrase_search",
      Some(s"""
        WITH toksl AS (
          SELECT doc_id, $tokensSql AS t FROM documents),
        pp AS (
          SELECT doc_id, u.p - 1 AS pos, t[u.p] AS token
          FROM toksl, unnest(generate_series(1, len(t))) AS u(p)),
        ph AS (
          SELECT * FROM (VALUES $phraseValuesSql) v(phrase_id, idx, term)),
        plen AS (SELECT phrase_id, COUNT(*) AS m FROM ph GROUP BY 1),
        starts AS (
          SELECT ph.phrase_id, pp.doc_id, pp.pos - ph.idx AS start,
                 COUNT(*) AS nmatch
          FROM pp JOIN ph ON ph.term = pp.token
          GROUP BY 1, 2, 3),
        occ AS (
          SELECT s.phrase_id, s.doc_id, COUNT(*) AS n_occ,
                 MIN(s.start) AS first_pos
          FROM starts s JOIN plen USING (phrase_id)
          WHERE s.nmatch = plen.m AND s.start >= 0
          GROUP BY 1, 2)
        SELECT phrase_id, doc_id, n_occ, first_pos, rk FROM (
          SELECT phrase_id, doc_id, n_occ, first_pos,
                 rank() OVER (PARTITION BY phrase_id
                              ORDER BY n_occ DESC, doc_id) AS rk
          FROM occ) r
        WHERE rk <= 10"""),
      (s, dir) => {
        import s.implicits._
        val phrases = phraseTerms.toDF("phrase_id", "idx", "term")
        val hits = graft.operators.Search.phraseHits(
          Tables.load(s, dir, "documents"), "doc_id", "text", phrases)
        val w = Window.partitionBy("phrase_id")
          .orderBy(col("n_occ").desc, col("doc_id"))
        hits.withColumn("rk", rank().over(w).cast("long"))
          .filter(col("rk") <= 10)
          .select(col("phrase_id"), col("doc_id"), col("n_occ"),
            col("first_pos"), col("rk"))
      }),

    // ---- q176: PROXIMITY search — unordered term-pair co-occurrence
    // within a 4-token window. The pair postings meet on doc_id (a
    // keyed equi-join; the |Δpos| predicate filters an already
    // doc-local pair set, never a position-range theta join), so the
    // plan scales with Σ tf_a·tf_b per doc, the same bound a
    // production engine's sliding intersection pays. Top-10 docs per
    // pair by qualifying-pair count. ----
    QuerySpec(
      "q176_proximity_search",
      Some(s"""
        WITH toksl AS (
          SELECT doc_id, $tokensSql AS t FROM documents),
        pp AS (
          SELECT doc_id, u.p - 1 AS pos, t[u.p] AS token
          FROM toksl, unnest(generate_series(1, len(t))) AS u(p)),
        pr AS (
          SELECT * FROM (VALUES $pairValuesSql) v(pair_id, term_a, term_b)),
        hits AS (
          SELECT a.pair_id, a.doc_id, COUNT(*) AS n_pairs,
                 MIN(abs(a.pos - b.pos)) AS min_dist
          FROM (SELECT pr.pair_id, pp.doc_id, pp.pos
                FROM pp JOIN pr ON pr.term_a = pp.token) a
          JOIN (SELECT pr.pair_id, pp.doc_id, pp.pos
                FROM pp JOIN pr ON pr.term_b = pp.token) b
            ON a.pair_id = b.pair_id AND a.doc_id = b.doc_id
          WHERE abs(a.pos - b.pos) <= 4
          GROUP BY 1, 2)
        SELECT pair_id, doc_id, n_pairs, min_dist, rk FROM (
          SELECT pair_id, doc_id, n_pairs, min_dist,
                 rank() OVER (PARTITION BY pair_id
                              ORDER BY n_pairs DESC, doc_id) AS rk
          FROM hits) r
        WHERE rk <= 10"""),
      (s, dir) => {
        import s.implicits._
        val pairs = pairTerms.toDF("pair_id", "term_a", "term_b")
        val hits = graft.operators.Search.proximityHits(
          Tables.load(s, dir, "documents"), "doc_id", "text", pairs, window = 4)
        val w = Window.partitionBy("pair_id")
          .orderBy(col("n_pairs").desc, col("doc_id"))
        hits.withColumn("rk", rank().over(w).cast("long"))
          .filter(col("rk") <= 10)
          .select(col("pair_id"), col("doc_id"), col("n_pairs"),
            col("min_dist"), col("rk"))
      }),

    // ---- q183: Dirichlet query-likelihood top-10 — the OTHER classic
    // probabilistic ranker next to BM25 (Zhai & Lafferty), in the
    // match-confined decomposition: Σ_{t∈q∩d} log(1 + tf·L/(μ·cf)) +
    // |q|·log(μ/(dl+μ)), all in the 16-bit fixed-point log2 (log2 vs
    // ln is a positive constant factor per term — rank-invariant), so
    // scores hash bit-for-bit. μ = 2000, the literature default.
    // Same workload and topology as q164 (one text scan via the
    // persisted postings, query-sized broadcasts, one doc-keyed
    // join) — a retrieval stack ships both rankers over one index. ----
    QuerySpec(
      "q183_ql_dirichlet_topk",
      Some(s"""
        WITH toks AS (
          SELECT doc_id, unnest($tokensSql) AS token FROM documents),
        tf AS (
          SELECT token, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        dl AS (
          SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
        stats AS (
          SELECT (SELECT CAST(SUM(tf) AS BIGINT) FROM tf) AS l),
        qt AS (
          SELECT * FROM (VALUES $queryValuesSql) AS v(query_id, term)),
        cfq AS (
          SELECT token, CAST(SUM(tf) AS BIGINT) AS cf FROM tf
          WHERE token IN (SELECT term FROM qt) GROUP BY token),
        qlen AS (
          SELECT query_id, COUNT(*) AS qlen FROM qt
          WHERE term IN (SELECT token FROM cfq) GROUP BY query_id),
        msum AS (
          SELECT qt.query_id, tf.doc_id,
                 CAST(SUM(${log2FpSql("2000 * cf + tf * l")}
                        - ${log2FpSql("2000 * cf")}) AS BIGINT) AS match_fp
          FROM tf
          JOIN qt ON qt.term = tf.token
          JOIN cfq ON cfq.token = tf.token
          CROSS JOIN stats
          GROUP BY 1, 2),
        scores AS (
          SELECT m.query_id, m.doc_id,
                 m.match_fp + q.qlen *
                   (${log2FpSql("2000")} - ${log2FpSql("dl + 2000")}) AS score_fp
          FROM msum m JOIN dl USING (doc_id) JOIN qlen q USING (query_id))
        SELECT query_id, doc_id, score_fp, rk FROM (
          SELECT query_id, doc_id, score_fp,
                 rank() OVER (PARTITION BY query_id
                              ORDER BY score_fp DESC, doc_id) AS rk
          FROM scores) r
        WHERE rk <= 10"""),
      (s, dir) => {
        import s.implicits._
        val queries = queryTerms.toDF("query_id", "term")
        graft.operators.Search.qlTopK(
          Tables.load(s, dir, "documents"), "doc_id", "text", queries,
          k = 10, mu = 2000L)
          .select(col("query_id"), col("doc_id"), col("score_fp"),
            col("rk").cast("long").as("rk"))
      }),

    // ---- q185: RECIPROCAL RANK FUSION of BM25 + query-likelihood —
    // the hybrid-search staple (Cormack et al.: rrf = Σ 1/(60+rank),
    // here 65536//(60+rk), integer floor — deterministic on both
    // engines). The load-bearing shape: ONE postings build feeds BOTH
    // rankers (`bm25FromPostings` / `qlFromPostings` over the same
    // persisted index — one index, many rankers, the way a serving
    // stack actually runs), then the two top-10 lists full-outer-join
    // on (query, doc) — rank-table-sized, not corpus-sized — and the
    // fused top-5 keeps each system's rank as evidence (null = that
    // system didn't retrieve the doc). ----
    QuerySpec(
      "q185_rrf_fusion",
      Some(s"""
        WITH toks AS (
          SELECT doc_id, unnest($tokensSql) AS token FROM documents),
        tf AS (
          SELECT token, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        dl AS (
          SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
        stats AS (
          SELECT (SELECT COUNT(*) FROM documents) AS n,
                 (SELECT CAST(SUM(tf) AS BIGINT) FROM tf) AS l),
        qt AS (
          SELECT * FROM (VALUES $queryValuesSql) AS v(query_id, term)),
        dfq AS (
          SELECT token, COUNT(*) AS df FROM tf
          WHERE token IN (SELECT term FROM qt) GROUP BY token),
        bcontrib AS (
          SELECT qt.query_id, tf.doc_id,
                 (${log2FpSql("2*n + 2")} - ${log2FpSql("2*df + 1")})
                   * (tf * 22 * l) // (10 * l * tf + 3 * l + 9 * dl * n) AS c
          FROM tf
          JOIN qt ON qt.term = tf.token
          JOIN dfq ON dfq.token = tf.token
          JOIN dl ON dl.doc_id = tf.doc_id
          CROSS JOIN stats),
        bm AS (
          SELECT query_id, doc_id, rk FROM (
            SELECT query_id, doc_id,
                   rank() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rk
            FROM (SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS score
                  FROM bcontrib GROUP BY 1, 2) s) r
          WHERE rk <= 10),
        cfq AS (
          SELECT token, CAST(SUM(tf) AS BIGINT) AS cf FROM tf
          WHERE token IN (SELECT term FROM qt) GROUP BY token),
        qlen AS (
          SELECT query_id, COUNT(*) AS qlen FROM qt
          WHERE term IN (SELECT token FROM cfq) GROUP BY query_id),
        msum AS (
          SELECT qt.query_id, tf.doc_id,
                 CAST(SUM(${log2FpSql("2000 * cf + tf * l")}
                        - ${log2FpSql("2000 * cf")}) AS BIGINT) AS match_fp
          FROM tf
          JOIN qt ON qt.term = tf.token
          JOIN cfq ON cfq.token = tf.token
          CROSS JOIN stats
          GROUP BY 1, 2),
        ql AS (
          SELECT query_id, doc_id, rk FROM (
            SELECT m.query_id, m.doc_id,
                   rank() OVER (PARTITION BY m.query_id
                                ORDER BY m.match_fp + q.qlen *
                                  (${log2FpSql("2000")} - ${log2FpSql("dl + 2000")})
                                  DESC, m.doc_id) AS rk
            FROM msum m JOIN dl USING (doc_id) JOIN qlen q USING (query_id)) r
          WHERE rk <= 10),
        fused AS (
          SELECT query_id, doc_id,
                 bm.rk AS rk_bm, ql.rk AS rk_ql,
                 COALESCE(65536 // (60 + bm.rk), 0)
               + COALESCE(65536 // (60 + ql.rk), 0) AS rrf_fp
          FROM bm FULL OUTER JOIN ql USING (query_id, doc_id))
        SELECT query_id, doc_id, rk_bm, rk_ql,
               CAST(rrf_fp AS BIGINT) AS rrf_fp, rk FROM (
          SELECT *, rank() OVER (PARTITION BY query_id
                                 ORDER BY rrf_fp DESC, doc_id) AS rk
          FROM fused) r
        WHERE rk <= 5"""),
      (s, dir) => {
        import s.implicits._
        val S = graft.operators.Search
        val queries = queryTerms.toDF("query_id", "term")
        val docs = Tables.load(s, dir, "documents")
        // NOT pre-populated: the two ranker subtrees share the postings
        // exchange via ReuseExchange, and an explicit count() measured
        // 1.4 s SLOWER at sf1 (an extra cache-write pass for a race
        // that reuse already prevents)
        val tf = S.postings(docs, "doc_id", "text")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val bm = S.bm25FromPostings(tf, docs.agg(count(lit(1)).as("n")),
            queries, k = 10)
          .select(col("query_id"), col("doc_id"), col("rk").cast("long").as("rk_bm"))
        val ql = S.qlFromPostings(tf, queries, k = 10, mu = 2000L)
          .select(col("query_id"), col("doc_id"), col("rk").cast("long").as("rk_ql"))
        val fused = bm.join(ql, Seq("query_id", "doc_id"), "full_outer")
          .withColumn("rrf_fp", expr(
            """coalesce(65536 div (60 + rk_bm), CAST(0 AS BIGINT))
             + coalesce(65536 div (60 + rk_ql), CAST(0 AS BIGINT))"""))
        val w = Window.partitionBy("query_id")
          .orderBy(col("rrf_fp").desc, col("doc_id"))
        fused.withColumn("rk", rank().over(w).cast("long"))
          .filter(col("rk") <= 5)
          .select(col("query_id"), col("doc_id"), col("rk_bm"), col("rk_ql"),
            col("rrf_fp"), col("rk"))
      }),

    // ---- q187: OFFLINE RANKING EVALUATION — MRR and nDCG@10 of the
    // q164 BM25 run against deterministic graded qrels derived from
    // the corpus itself: rel(q,d) = number of q's terms d contains
    // (AND-match grading; "fully relevant" for MRR = all 3). The
    // metrics are integer end to end (gain (2^rel−1), log2 in the
    // 16.16 fixed point, floor divisions), so the whole eval hash-
    // replays in DuckDB — an IR team's index-change gate as dataflow.
    // Scale shape: DCG is a rank-table-sized left join; IDCG never
    // sorts qrels — per-(query,rel) COUNTS (rel domain ≤ 3) expand to
    // the ≤10 ideal positions via sequence(). ----
    QuerySpec(
      "q187_ir_metrics",
      Some(s"""
        WITH toks AS (
          SELECT doc_id, unnest($tokensSql) AS token FROM documents),
        tf AS (
          SELECT token, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        dl AS (
          SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
        stats AS (
          SELECT (SELECT COUNT(*) FROM documents) AS n,
                 (SELECT CAST(SUM(tf) AS BIGINT) FROM tf) AS l),
        qt AS (
          SELECT * FROM (VALUES $evalValuesSql) AS v(query_id, term)),
        dfq AS (
          SELECT token, COUNT(*) AS df FROM tf
          WHERE token IN (SELECT term FROM qt) GROUP BY token),
        contrib AS (
          SELECT qt.query_id, tf.doc_id,
                 (${log2FpSql("2*n + 2")} - ${log2FpSql("2*df + 1")})
                   * (tf * 22 * l) // (10 * l * tf + 3 * l + 9 * dl * n) AS c
          FROM tf
          JOIN qt ON qt.term = tf.token
          JOIN dfq ON dfq.token = tf.token
          JOIN dl ON dl.doc_id = tf.doc_id
          CROSS JOIN stats),
        ranked AS (
          SELECT query_id, doc_id, rk FROM (
            SELECT query_id, doc_id,
                   rank() OVER (PARTITION BY query_id
                                ORDER BY score_fp DESC, doc_id) AS rk
            FROM (SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS score_fp
                  FROM contrib GROUP BY 1, 2) s) r
          WHERE rk <= 10),
        qrel AS (
          SELECT qt.query_id, tf.doc_id, COUNT(*) AS rel
          FROM tf JOIN qt ON qt.term = tf.token
          GROUP BY 1, 2),
        dcg AS (
          SELECT r.query_id,
                 CAST(SUM(((CAST(1 AS BIGINT) << CAST(COALESCE(q.rel, 0) AS INT)) - 1)
                      * 4294967296 // (${log2FpSql("r.rk + 1")})) AS BIGINT) AS dcg_fp,
                 CAST(COALESCE(65536 // MIN(CASE WHEN q.rel >= 3 THEN r.rk END), 0)
                      AS BIGINT) AS mrr_fp
          FROM ranked r
          LEFT JOIN qrel q ON q.query_id = r.query_id AND q.doc_id = r.doc_id
          GROUP BY 1),
        levels AS (
          SELECT query_id, rel, COUNT(*) AS cnt FROM qrel GROUP BY 1, 2),
        spans AS (
          SELECT query_id, rel,
                 CAST(SUM(cnt) OVER (PARTITION BY query_id ORDER BY rel DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - cnt + 1 AS BIGINT) AS startp,
                 CAST(LEAST(SUM(cnt) OVER (PARTITION BY query_id ORDER BY rel DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 10) AS BIGINT) AS endp
          FROM levels),
        ipos AS (
          SELECT query_id, rel, unnest(generate_series(startp, endp)) AS pos
          FROM spans WHERE startp <= 10),
        idcg AS (
          SELECT query_id,
                 CAST(SUM(((CAST(1 AS BIGINT) << CAST(rel AS INT)) - 1)
                      * 4294967296 // (${log2FpSql("pos + 1")})) AS BIGINT) AS idcg_fp
          FROM ipos GROUP BY 1)
        SELECT d.query_id, d.mrr_fp, d.dcg_fp,
               CAST(COALESCE(i.idcg_fp, 0) AS BIGINT) AS idcg_fp,
               CAST(CASE WHEN COALESCE(i.idcg_fp, 0) > 0
                    THEN d.dcg_fp * 65536 // i.idcg_fp ELSE 0 END AS BIGINT) AS ndcg_fp
        FROM dcg d LEFT JOIN idcg i ON i.query_id = d.query_id"""),
      (s, dir) => {
        import s.implicits._
        val S = graft.operators.Search
        val docs = Tables.load(s, dir, "documents")
        val queries = evalTerms.toDF("query_id", "term")
        // NOT pre-populated — the q185 ReuseExchange measurement
        val tf = S.postings(docs, "doc_id", "text")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val ranked = S.bm25FromPostings(tf, docs.agg(count(lit(1)).as("n")),
            queries, k = 10)
          .select(col("query_id"), col("doc_id"), col("rk"))
        // graded qrels from the same postings: (token, doc) is unique in
        // tf and each query's terms are distinct, so COUNT(*) = number
        // of distinct query terms the doc contains
        val qrels = tf
          .join(broadcast(queries.select(col("query_id"), col("term").as("token"))),
            "token")
          .groupBy("query_id", "doc_id").agg(count(lit(1)).as("rel"))
        S.rankingMetrics(ranked, qrels, k = 10, mrrMinRel = 3)
      })
  )
}
