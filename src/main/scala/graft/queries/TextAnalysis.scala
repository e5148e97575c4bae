package graft.queries

import graft.{QuerySpec, Tables}
import graft.functions.{GraftFunctions, TextFunctions => T}
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over the `documents` and
  * `embeddings` tables: dedup (exact, MinHash-LSH, SimHash, n-gram
  * Jaccard, embedding-cosine), ANN search, text analysis (lang-id,
  * quality, token counts, fingerprinting). SQL-expressible ops carry a
  * DuckDB oracle; signature/LSH ops are Spark-only (rows-only check) and
  * are instead verified against brute-force ground truth in ScalaTest.
  */
object TextAnalysis {

  val specs: Seq[QuerySpec] = Seq(

    // ---- q30: exact dedup by content hash ----
    QuerySpec(
      "q30_dedup_exact",
      Some("""
        SELECT md5(text) AS content_md5, MIN(doc_id) AS keep_id, COUNT(*) AS n
        FROM documents GROUP BY 1"""),
      (s, dir) =>
        graft.operators.Fanout.forKernel(Tables.load(s, dir, "documents"))
          .groupBy(md5(col("text")).as("content_md5"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))),

    // ---- q31: exact dedup on normalized text ----
    QuerySpec(
      "q31_dedup_exact_normalized",
      Some("""
        SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS content_md5,
               MIN(doc_id) AS keep_id, COUNT(*) AS n
        FROM documents GROUP BY 1"""),
      (s, dir) =>
        graft.operators.Fanout.forKernel(Tables.load(s, dir, "documents"))
          .groupBy(md5(T.normalizeText(col("text"))).as("content_md5"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))),

    // ---- q32: token counting ----
    QuerySpec(
      "q32_token_stats",
      Some("""
        SELECT doc_id,
               CASE WHEN norm = '' THEN 0
                    ELSE CAST(LEN(STRING_SPLIT(norm, ' ')) AS BIGINT) END AS n_tokens,
               CAST(LENGTH(norm) AS BIGINT) AS n_chars_norm
        FROM (SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
              FROM documents)"""),
      (s, dir) =>
        graft.operators.Fanout.forKernel(Tables.load(s, dir, "documents"))
          .select(
            col("doc_id"),
            T.tokenCount(col("text")).as("n_tokens"),
            length(T.normalizeText(col("text"))).cast("long").as("n_chars_norm"))),

    // ---- q34: per-language corpus profile ----
    QuerySpec(
      "q34_lang_profile",
      Some("""
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
        FROM documents GROUP BY lang"""),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))),

    // ---- q35: language identification — oracle mirrors the marker
    // scoring + struct-argmax (DuckDB structs compare field-order
    // lexicographically, same as Spark's greatest over structs) ----
    QuerySpec(
      "q35_lang_id",
      Some {
        val langs = T.langMarkers.toSeq.sortBy(_._1)
        val scoreCols = langs.map { case (lang, markers) =>
          val score = markers.map { m =>
            s"CAST((LENGTH(p) - LENGTH(REPLACE(p, '$m', '')))/${m.length} AS BIGINT)"
          }.mkString(" + ")
          s"($score) AS s_$lang"
        }
        // ties: Spark's greatest over (score, lang) structs picks the
        // LARGEST lang string — mirrored by checking langs descending
        val tieCases = langs.map(_._1).sorted.reverse
          .map(l => s"WHEN s_$l = mx THEN '$l'").mkString("\n               ")
        s"""
        WITH norm AS (
          SELECT doc_id,
                 ' ' || regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') || ' ' AS p
          FROM documents
        ), scored AS (
          SELECT doc_id, ${scoreCols.mkString(",\n            ")}
          FROM norm
        ), best AS (
          SELECT *, GREATEST(${langs.map(l => "s_" + l._1).mkString(", ")}) AS mx
          FROM scored
        )
        SELECT doc_id,
               CASE WHEN mx = 0 THEN 'und'
               $tieCases
               ELSE 'und' END AS lang_pred
        FROM best"""
      },
      (s, dir) =>
        graft.operators.Fanout.forKernel(Tables.load(s, dir, "documents"))
          .select(col("doc_id"), T.langId(col("text")).as("lang_pred"))),

    // ---- q33: quality scoring — the DuckDB oracle mirrors the exact
    // IEEE arithmetic of TextFunctions.qualityMetrics ----
    QuerySpec(
      "q33_quality_score",
      Some("""
        WITH norm AS (
          SELECT doc_id,
                 regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS nrm
          FROM documents
        ), base AS (
          SELECT doc_id, nrm,
                 CAST(LENGTH(nrm) AS DOUBLE) AS n_chars_d,
                 CASE WHEN LENGTH(nrm) = 0 THEN CAST(0 AS DOUBLE)
                      ELSE CAST(LEN(STRING_SPLIT(nrm, ' ')) AS DOUBLE) END AS n_toks_d,
                 CAST(LENGTH(regexp_replace(nrm, '[^a-z]', '', 'g')) AS DOUBLE) AS alpha,
                 CAST(LENGTH(regexp_replace(nrm, '[^.,;:!?''"()]', '', 'g')) AS DOUBLE) AS punct,
                 CAST(
                   CAST((LENGTH(' '||nrm||' ') - LENGTH(REPLACE(' '||nrm||' ', ' the ', '')))/5 AS BIGINT)
                 + CAST((LENGTH(' '||nrm||' ') - LENGTH(REPLACE(' '||nrm||' ', ' a ', '')))/3 AS BIGINT)
                 + CAST((LENGTH(' '||nrm||' ') - LENGTH(REPLACE(' '||nrm||' ', ' and ', '')))/5 AS BIGINT)
                 + CAST((LENGTH(' '||nrm||' ') - LENGTH(REPLACE(' '||nrm||' ', ' of ', '')))/4 AS BIGINT)
                 + CAST((LENGTH(' '||nrm||' ') - LENGTH(REPLACE(' '||nrm||' ', ' to ', '')))/4 AS BIGINT)
                 + CAST((LENGTH(' '||nrm||' ') - LENGTH(REPLACE(' '||nrm||' ', ' in ', '')))/4 AS BIGINT)
                 + CAST((LENGTH(' '||nrm||' ') - LENGTH(REPLACE(' '||nrm||' ', ' is ', '')))/4 AS BIGINT)
                 AS DOUBLE) AS stop_d
          FROM norm
        ), derived AS (
          SELECT doc_id, n_chars_d, n_toks_d,
                 GREATEST(n_chars_d, 1.0) AS safe_chars,
                 GREATEST(n_toks_d, 1.0) AS safe_toks,
                 alpha, punct, stop_d
          FROM base
        )
        SELECT doc_id,
               CAST(n_chars_d AS BIGINT) AS n_chars,
               CAST(n_toks_d AS BIGINT) AS n_tokens,
               (n_chars_d - (n_toks_d - 1)) / safe_toks AS avg_token_len,
               alpha / safe_chars AS alpha_ratio,
               punct / safe_chars AS punct_ratio,
               stop_d / safe_toks AS stopword_ratio,
               (CASE WHEN n_toks_d BETWEEN 5 AND 100000
                      AND (n_chars_d - (n_toks_d - 1)) / safe_toks BETWEEN 2 AND 12
                     THEN 1.0 ELSE 0.0 END * 0.4)
               + (alpha / safe_chars * 0.3)
               + (LEAST(stop_d / safe_toks * 5, 1.0) * 0.2)
               + ((1.0 - LEAST(punct / safe_chars * 5, 1.0)) * 0.1) AS quality_score
        FROM derived"""),
      (s, dir) =>
        graft.operators.Fanout.forKernel(Tables.load(s, dir, "documents"))
          .select(col("doc_id"), T.qualityMetrics(col("text")).as("m"))
          .select(col("doc_id"), col("m.*"))),

    // ---- q36: document fingerprinting (custom Catalyst expression).
    // The oracle replays the EXACT rolling hash (h = 31h + byte mod 2^64,
    // seed 1125899906842597, over UTF-8 bytes of the normalized text) in
    // DuckDB: hex(encode(...)) exposes the bytes, list_reduce folds them
    // in HUGEINT with an explicit mod-2^64, and the final CASE re-wraps
    // to signed BIGINT. Pure SQL replay of GraftExpressions.Fingerprint64
    // — not a weaker twin ----
    QuerySpec(
      "q36_fingerprint",
      Some("""
        WITH norm AS (
          SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS nrm
          FROM documents
        ), hx AS (
          SELECT doc_id, lower(hex(encode(nrm))) AS h FROM norm
        ), folded AS (
          SELECT doc_id,
                 list_reduce(
                   list_prepend(CAST(1125899906842597 AS HUGEINT),
                     list_transform(range(1, length(h) + 1, 2),
                       i -> CAST((strpos('0123456789abcdef', h[i]) - 1) * 16
                               + (strpos('0123456789abcdef', h[i+1]) - 1) AS HUGEINT))),
                   (acc, b) -> (31 * acc + b) % 18446744073709551616
                 ) AS v
          FROM hx
        )
        SELECT doc_id,
               CAST(CASE WHEN v >= 9223372036854775808
                         THEN v - 18446744073709551616 ELSE v END AS BIGINT) AS fingerprint
        FROM folded"""),
      (s, dir) => {
        GraftFunctions.register(s)
        graft.operators.Fanout.forKernel(Tables.load(s, dir, "documents"))
          .select(
            col("doc_id"),
            GraftFunctions.fingerprint64(T.normalizeText(col("text"))).as("fingerprint"))
      }),

    // ---- q37: per-doc SimHash (custom Catalyst expression SimHash64
    // does the voting in one pass on the Spark side). Token hashes are
    // md5 prefixes — a family BOTH engines compute natively — so the
    // oracle can replay the whole thing: per-token md5 folded to a
    // HUGEINT, 64 per-bit majority votes (ties set the bit, matching
    // votes(b) >= 0), re-wrapped to the signed long ----
    QuerySpec(
      "q37_simhash",
      Some("""
        WITH toks AS (
          SELECT doc_id, CASE WHEN nrm = '' THEN [] ELSE string_split(nrm, ' ') END AS t
          FROM (SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS nrm
                FROM documents)
        ), hashes AS (
          SELECT doc_id,
                 list_transform(t, tok -> list_reduce(
                   list_prepend(CAST(0 AS HUGEINT),
                     list_transform(range(1, 17),
                       i -> CAST(strpos('0123456789abcdef', md5(tok)[i]) - 1 AS HUGEINT))),
                   (acc, d) -> acc * 16 + d)) AS hs
          FROM toks
        ), votes AS (
          SELECT doc_id,
                 list_transform(range(0, 64), b ->
                   CASE WHEN len(list_filter(hs,
                          h -> (h // (CAST(1 AS HUGEINT) << b)) % 2 = 1)) * 2 >= len(hs)
                        THEN CAST(1 AS HUGEINT) << b ELSE CAST(0 AS HUGEINT) END) AS bits
          FROM hashes
        )
        SELECT doc_id,
               CAST(CASE WHEN v >= 9223372036854775808
                         THEN v - 18446744073709551616 ELSE v END AS BIGINT) AS simhash
        FROM (SELECT doc_id, list_sum(bits) AS v FROM votes)"""),
      (s, dir) => Dedup.simhashes(Tables.load(s, dir, "documents"), "doc_id", "text")),

    // ---- q38: MinHash-LSH near-dedup, keeper per doc ----
    QuerySpec(
      "q38_dedup_minhash_lsh",
      None,
      (s, dir) => Dedup.minhashLsh(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.5)),

    // ---- q91: the MinHash-LSH pipeline under the hash oracle — q38's
    // exact shape (shingle→signature→band→bucket-pairs→verify→keeper)
    // with the md5-prefix shingle family so DuckDB can replay EVERY
    // step: signatures via the same splitmix64-seeded affine family
    // (coefficients inlined from MinHashSignature.coefficients — one
    // source of truth; mod-2^64 products split 32/32 so HUGEINT never
    // overflows; mins taken as SIGNED longs like the expression),
    // banding by the raw signature slice (bucket-equivalent to the
    // xxhash64 band key), exact-Jaccard verification, single-hop keeper.
    // k=32/8 bands keeps the oracle a few seconds at gate scale. The
    // hot-bucket cap cannot trigger at 500 docs (cap 4096), so the
    // uncapped replay is exact ----
    QuerySpec(
      "q91_dedup_minhash_md5",
      Some(s"""
        WITH ${MinhashOracle.signaturesCte(32, 8)},
        ${MinhashOracle.verifiedSelfPairsCte(0.5)},
        best AS (
          SELECT id_b AS doc_id, MIN(id_a) AS partner_min FROM verified GROUP BY 1
        )
        SELECT d.doc_id,
               LEAST(COALESCE(partner_min, d.doc_id), d.doc_id) AS keep_id,
               LEAST(COALESCE(partner_min, d.doc_id), d.doc_id) <> d.doc_id AS is_duplicate
        FROM documents d LEFT JOIN best USING (doc_id)"""),
      (s, dir) => Dedup.minhashLsh(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.5,
        shingleHasher = T.md5ShingleHashes)),

    // ---- q46: corpus redaction (emails/URLs/digit runs) ----
    QuerySpec(
      "q46_redact",
      Some("""
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 'https?://[^\s]+', '<URL>', 'g'),
                 '[0-9]{9,}', '<NUM>', 'g') AS redacted
        FROM documents"""),
      (s, dir) =>
        graft.operators.Fanout.forKernel(Tables.load(s, dir, "documents"))
          .select(col("doc_id"), T.redact(col("text")).as("redacted"))),

    // ---- q47: benchmark decontamination (anti-join on content hash) ----
    QuerySpec(
      "q47_decontaminate",
      Some("""
        WITH norm AS (
          SELECT doc_id, text,
                 md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS h
          FROM documents
        ), block AS (
          SELECT DISTINCT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS h
          FROM documents WHERE doc_id % 10 = 0
        )
        SELECT doc_id FROM norm
        WHERE NOT EXISTS (SELECT 1 FROM block WHERE block.h = norm.h)"""),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.decontaminate(docs, "text",
          docs.filter(col("doc_id") % 10 === 0), "text")
          .select("doc_id")
      }),

    // ---- q48: deterministic sampling (reproducible corpus mixes) ----
    QuerySpec(
      "q48_deterministic_sample",
      Some("""
        SELECT doc_id, lang FROM documents
        WHERE ((doc_id % 1000000007) * 2654435761) % 100 < 25"""),
      (s, dir) =>
        Dedup.deterministicSample(
          Tables.load(s, dir, "documents"), "doc_id", 25)
          .select("doc_id", "lang")),

    // ---- q45: MinHash-LSH dedup with TRANSITIVE clusters ----
    QuerySpec(
      "q45_dedup_minhash_transitive",
      None,
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.connectedComponents(docs, "doc_id",
          Dedup.minhashCandidatePairs(docs, "doc_id", "text",
            shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.5))
      }),

    // ---- q39: n-gram Jaccard top pairs (brute ground truth slice).
    // Spark computes Jaccard over FNV-hashed distinct shingles
    // (ShingleHashes64); the oracle computes it over the RAW shingle
    // string sets — equal unless the 64-bit hash collides inside a
    // pair's shingle union (~|S|²/2⁶⁴), so the gate doubles as a
    // collision-freeness check. Tiebreak (jaccard DESC, id_a, id_b) is
    // total, making LIMIT 20 deterministic on both engines ----
    QuerySpec(
      "q39_jaccard_top_pairs",
      Some("""
        WITH toks AS (
          SELECT doc_id, CASE WHEN nrm = '' THEN [] ELSE string_split(nrm, ' ') END AS t
          FROM (SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS nrm
                FROM documents WHERE doc_id < 50)
        ), sh AS (
          SELECT doc_id,
                 CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                      ELSE list_transform(range(1, len(t) - 1),
                             i -> array_to_string(t[i:i+2], ' ')) END AS s
          FROM toks
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CASE WHEN len(list_distinct(a.s || b.s)) = 0 THEN CAST(1.0 AS DOUBLE)
                    ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                       / CAST(len(list_distinct(a.s || b.s)) AS DOUBLE) END AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        ORDER BY jaccard DESC, id_a, id_b LIMIT 20"""),
      (s, dir) =>
        Dedup.jaccardPairsBrute(
          Tables.load(s, dir, "documents").filter(col("doc_id") < 50),
          "doc_id", "text", shingleSize = 3)
          .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
          .limit(20)),

    // ---- q188: LSH CANDIDATE-RECALL EVALUATION — the measured S-curve
    // of the q91 banding config (k=32, 8 bands of 4 rows): exact
    // Jaccard ground truth over a bounded evaluation slice, bucketed by
    // integer similarity decile ((10·|∩|) div |∪| — no float crosses an
    // engine boundary), LEFT-joined against the PRE-verification
    // candidate pairs the banded bucket join emits. Per bucket:
    // n_truth, n_hit, recall_fp. This is the number a dedup team tunes
    // bands/rows against — theory says P(cand) = 1−(1−j^4)^8; this
    // measures it on the actual corpus. The brute truth is the q39
    // protocol (offline eval on a deterministic sample — at 100 TB you
    // sample ~10k docs, never all-pairs the corpus); the candidate side
    // runs the REAL production operator (minhashCandidatePairs,
    // threshold 0 = keep every bucket pair) with the md5 family, so
    // DuckDB replays signature→band→bucket→pair exactly (q91
    // playbook). ----
    QuerySpec(
      "q188_lsh_recall_eval",
      Some {
        val k = 32; val bands = 8; val rows = k / bands
        val (as, bs) = graft.functions.MinHashSignature.coefficients(k)
        def unsigned(v: Long): java.math.BigInteger =
          if (v >= 0) java.math.BigInteger.valueOf(v)
          else java.math.BigInteger.valueOf(v).add(java.math.BigInteger.ONE.shiftLeft(64))
        val coeffRows = (0 until k).map(j =>
          s"($j, CAST('${unsigned(as(j))}' AS HUGEINT), CAST('${unsigned(bs(j))}' AS HUGEINT))")
          .mkString(",\n          ")
        s"""
        WITH coeffs(j, a, b) AS (VALUES
          $coeffRows),
        toks AS (
          SELECT doc_id, CASE WHEN nrm = '' THEN [] ELSE string_split(nrm, ' ') END AS t
          FROM (SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS nrm
                FROM documents WHERE doc_id < 300)
        ), sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                        ELSE list_transform(range(1, len(t) - 1),
                               i -> array_to_string(t[i:i+2], ' ')) END,
                   s -> list_reduce(list_prepend(CAST(0 AS HUGEINT),
                          list_transform(range(1, 17),
                            i -> CAST(strpos('0123456789abcdef', md5(s)[i]) - 1 AS HUGEINT))),
                          (acc, d) -> acc * 16 + d))) AS hs
          FROM toks
        ), expl AS (SELECT doc_id, unnest(hs) AS x FROM sh),
        scoredh AS (
          SELECT e.doc_id, c.j,
                 ((c.a * (e.x // 4294967296)) % 4294967296 * 4294967296
                   + c.a * (e.x % 4294967296) + c.b) % 18446744073709551616 AS hv
          FROM expl e CROSS JOIN coeffs c
        ), minh AS (
          SELECT doc_id, j,
                 MIN(CAST(CASE WHEN hv >= 9223372036854775808
                               THEN hv - 18446744073709551616 ELSE hv END AS BIGINT)) AS m
          FROM scoredh GROUP BY 1, 2
        ), sigs AS (
          SELECT doc_id, list(m ORDER BY j) AS sig FROM minh GROUP BY 1
        ), banded AS (
          SELECT doc_id, b, sig[b*$rows+1 : b*$rows+$rows] AS key
          FROM sigs, (SELECT unnest(range(0, $bands)) AS b)
        ), cand AS (
          SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b
          FROM banded a JOIN banded bb
            ON a.b = bb.b AND a.key = bb.key AND a.doc_id < bb.doc_id
        ), truth AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 len(list_intersect(a.hs, b.hs)) AS inter,
                 len(list_distinct(a.hs || b.hs)) AS uni
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE len(list_intersect(a.hs, b.hs)) > 0
        )
        SELECT CAST((inter * 10) // uni AS BIGINT) AS bucket,
               COUNT(*) AS n_truth,
               CAST(SUM(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_hit,
               CAST(SUM(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END) * 65536
                 // COUNT(*) AS BIGINT) AS recall_fp
        FROM truth t
        LEFT JOIN cand c ON c.id_a = t.id_a AND c.id_b = t.id_b
        GROUP BY 1"""
      },
      (s, dir) => {
        val slice = Tables.load(s, dir, "documents").filter(col("doc_id") < 300)
        // shingle sets feed both brute-truth sides — materialized once
        val sh = slice.select(col("doc_id").cast("long").as("doc_id"),
            T.md5ShingleHashes(col("text"), 3).as("sh"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val truth = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
          .crossJoin(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("inter"),
            size(array_union(col("sh_a"), col("sh_b"))).cast("long").as("uni"))
          .filter(col("inter") > 0)
          .withColumn("bucket", expr("(inter * 10) div uni"))
        // threshold 0 keeps every banded bucket pair = the candidate set
        val cand = Dedup.minhashCandidatePairs(slice, "doc_id", "text",
            shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.0,
            shingleHasher = T.md5ShingleHashes)
          .select(col("id_a").cast("long").as("id_a"),
            col("id_b").cast("long").as("id_b"))
          .withColumn("hit", lit(1L))
        truth.join(cand, Seq("id_a", "id_b"), "left")
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_truth"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .withColumn("recall_fp", expr("(n_hit * 65536) div n_truth"))
      }),

    // ---- q191: containment mining AFTER near-dedup — the PRODUCTION
    // SEQUENCE the q182 sf1 audit prescribes: MinHash near-dedup (the
    // q91 pipeline, md5 family) elects keepers first, containment
    // mining (q182's topology) runs on the deduped corpus only. On a
    // corpus with replica-clique duplicate mass this is the difference
    // between quadratic and linear containment cost (measured in
    // SCALING.md), and it is also the semantically right order: a
    // containment hit between two near-identical docs is dedup's job,
    // not the quote/wrapper detector's. The oracle staples the two
    // replay chains — q91's full signature→band→verify→keeper election
    // and q182's capped postings self-join — under one hash. ----
    QuerySpec(
      "q191_containment_after_neardedup",
      Some {
        val k = 32; val bands = 8; val rows = k / bands
        val (as, bs) = graft.functions.MinHashSignature.coefficients(k)
        def unsigned(v: Long): java.math.BigInteger =
          if (v >= 0) java.math.BigInteger.valueOf(v)
          else java.math.BigInteger.valueOf(v).add(java.math.BigInteger.ONE.shiftLeft(64))
        val coeffRows = (0 until k).map(j =>
          s"($j, CAST('${unsigned(as(j))}' AS HUGEINT), CAST('${unsigned(bs(j))}' AS HUGEINT))")
          .mkString(",\n          ")
        val shingleCase = """
          CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_transform(range(1, len(t) - 1),
                      i -> array_to_string(t[i:i+2], ' ')) END"""
        s"""
        WITH coeffs(j, a, b) AS (VALUES
          $coeffRows),
        toks AS MATERIALIZED (
          SELECT doc_id, CASE WHEN nrm = '' THEN [] ELSE string_split(nrm, ' ') END AS t
          FROM (SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS nrm
                FROM documents)
        ), hsh AS MATERIALIZED (
          SELECT doc_id,
                 list_distinct(list_transform($shingleCase,
                   s -> list_reduce(list_prepend(CAST(0 AS HUGEINT),
                          list_transform(range(1, 17),
                            i -> CAST(strpos('0123456789abcdef', md5(s)[i]) - 1 AS HUGEINT))),
                          (acc, d) -> acc * 16 + d))) AS hs
          FROM toks
        ), expl AS (SELECT doc_id, unnest(hs) AS x FROM hsh),
        scoredh AS (
          SELECT e.doc_id, c.j,
                 ((c.a * (e.x // 4294967296)) % 4294967296 * 4294967296
                   + c.a * (e.x % 4294967296) + c.b) % 18446744073709551616 AS hv
          FROM expl e CROSS JOIN coeffs c
        ), minh AS (
          SELECT doc_id, j,
                 MIN(CAST(CASE WHEN hv >= 9223372036854775808
                               THEN hv - 18446744073709551616 ELSE hv END AS BIGINT)) AS m
          FROM scoredh GROUP BY 1, 2
        ), sigs AS (
          SELECT doc_id, list(m ORDER BY j) AS sig FROM minh GROUP BY 1
        ), banded AS (
          SELECT doc_id, b, sig[b*$rows+1 : b*$rows+$rows] AS key
          FROM sigs, (SELECT unnest(range(0, $bands)) AS b)
        ), pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b
          FROM banded a JOIN banded bb
            ON a.b = bb.b AND a.key = bb.key AND a.doc_id < bb.doc_id
        ), verified AS (
          SELECT p.id_a, p.id_b
          FROM pairs p
          JOIN hsh s1 ON s1.doc_id = p.id_a
          JOIN hsh s2 ON s2.doc_id = p.id_b
          WHERE CASE WHEN len(list_distinct(s1.hs || s2.hs)) = 0 THEN 1.0
                     ELSE CAST(len(list_intersect(s1.hs, s2.hs)) AS DOUBLE)
                        / CAST(len(list_distinct(s1.hs || s2.hs)) AS DOUBLE) END >= 0.5
        ), best AS (
          SELECT id_b AS doc_id, MIN(id_a) AS partner_min FROM verified GROUP BY 1
        ), kept AS MATERIALIZED (
          SELECT d.doc_id FROM documents d LEFT JOIN best USING (doc_id)
          WHERE LEAST(COALESCE(partner_min, d.doc_id), d.doc_id) = d.doc_id
        ), csh AS MATERIALIZED (
          SELECT DISTINCT t.doc_id, unnest($shingleCase) AS s
          FROM (SELECT toks.doc_id, toks.t FROM toks JOIN kept USING (doc_id)) t
        ), nn AS (SELECT COUNT(*) AS n FROM kept),
        rare AS (
          SELECT s FROM (SELECT s, COUNT(*) AS df FROM csh GROUP BY s) d
          CROSS JOIN nn
          WHERE df * 15 <= n AND df <= ${graft.operators.Dedup.DefaultMaxDfAbs}),
        rsh AS MATERIALIZED (SELECT csh.doc_id, csh.s FROM csh JOIN rare USING (s)),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM rsh GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter
          FROM rsh a JOIN rsh b ON a.s = b.s AND a.doc_id <> b.doc_id
          GROUP BY 1, 2)
        SELECT ia AS inner_id, ib AS outer_id, inter,
               sa.sz AS sz_inner, sb.sz AS sz_outer,
               inter * 65536 // sa.sz AS cont_fp
        FROM inter
        JOIN sizes sa ON sa.doc_id = ia
        JOIN sizes sb ON sb.doc_id = ib
        WHERE (sa.sz < sb.sz OR (sa.sz = sb.sz AND ia < ib))
          AND inter * 65536 // sa.sz >= 13108"""
      },
      (s, dir) => {
        val docs = graft.operators.Fanout.forKernel(
          Tables.load(s, dir, "documents"))
        val kept = Dedup.minhashLsh(docs, "doc_id", "text",
            shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.5,
            shingleHasher = T.md5ShingleHashes)
          .filter(!col("is_duplicate")).select(col("doc_id"))
        Dedup.containmentPairs(docs.join(kept, "doc_id"), "doc_id", "text",
          ngram = 3, maxDfShare = 15, minContainmentFp = 13108L)
      }),

    // ---- q192: CURATION EXPORT — the q191 production sequence folded
    // into the per-document export a trainer consumes (the r12/r13
    // advice: the exported corpus must be the CURATED one): one row per
    // document carrying the near-dedup verdict (q91's chain — keep_id,
    // is_duplicate) AND the containment verdict over the deduped corpus
    // (q191's chain — contained_in = the smallest outer doc this doc is
    // quoted whole inside, −1 if none), plus the single flag
    // keep_for_training = ¬is_duplicate ∧ ¬contained that downstream
    // filters on. Doc-grain like q174's multimodal export, so the
    // composed curated training set is ONE equi-join of two pinned
    // results on doc_id. The oracle staples both replay chains under
    // one hash. ----
    QuerySpec(
      "q192_curation_export",
      Some {
        val k = 32; val bands = 8; val rows = k / bands
        val (as, bs) = graft.functions.MinHashSignature.coefficients(k)
        def unsigned(v: Long): java.math.BigInteger =
          if (v >= 0) java.math.BigInteger.valueOf(v)
          else java.math.BigInteger.valueOf(v).add(java.math.BigInteger.ONE.shiftLeft(64))
        val coeffRows = (0 until k).map(j =>
          s"($j, CAST('${unsigned(as(j))}' AS HUGEINT), CAST('${unsigned(bs(j))}' AS HUGEINT))")
          .mkString(",\n          ")
        val shingleCase = """
          CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_transform(range(1, len(t) - 1),
                      i -> array_to_string(t[i:i+2], ' ')) END"""
        s"""
        WITH coeffs(j, a, b) AS (VALUES
          $coeffRows),
        toks AS MATERIALIZED (
          SELECT doc_id, CASE WHEN nrm = '' THEN [] ELSE string_split(nrm, ' ') END AS t
          FROM (SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS nrm
                FROM documents)
        ), hsh AS MATERIALIZED (
          SELECT doc_id,
                 list_distinct(list_transform($shingleCase,
                   s -> list_reduce(list_prepend(CAST(0 AS HUGEINT),
                          list_transform(range(1, 17),
                            i -> CAST(strpos('0123456789abcdef', md5(s)[i]) - 1 AS HUGEINT))),
                          (acc, d) -> acc * 16 + d))) AS hs
          FROM toks
        ), expl AS (SELECT doc_id, unnest(hs) AS x FROM hsh),
        scoredh AS (
          SELECT e.doc_id, c.j,
                 ((c.a * (e.x // 4294967296)) % 4294967296 * 4294967296
                   + c.a * (e.x % 4294967296) + c.b) % 18446744073709551616 AS hv
          FROM expl e CROSS JOIN coeffs c
        ), minh AS (
          SELECT doc_id, j,
                 MIN(CAST(CASE WHEN hv >= 9223372036854775808
                               THEN hv - 18446744073709551616 ELSE hv END AS BIGINT)) AS m
          FROM scoredh GROUP BY 1, 2
        ), sigs AS (
          SELECT doc_id, list(m ORDER BY j) AS sig FROM minh GROUP BY 1
        ), banded AS (
          SELECT doc_id, b, sig[b*$rows+1 : b*$rows+$rows] AS key
          FROM sigs, (SELECT unnest(range(0, $bands)) AS b)
        ), pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b
          FROM banded a JOIN banded bb
            ON a.b = bb.b AND a.key = bb.key AND a.doc_id < bb.doc_id
        ), verified AS (
          SELECT p.id_a, p.id_b
          FROM pairs p
          JOIN hsh s1 ON s1.doc_id = p.id_a
          JOIN hsh s2 ON s2.doc_id = p.id_b
          WHERE CASE WHEN len(list_distinct(s1.hs || s2.hs)) = 0 THEN 1.0
                     ELSE CAST(len(list_intersect(s1.hs, s2.hs)) AS DOUBLE)
                        / CAST(len(list_distinct(s1.hs || s2.hs)) AS DOUBLE) END >= 0.5
        ), best AS (
          SELECT id_b AS doc_id, MIN(id_a) AS partner_min FROM verified GROUP BY 1
        ), kept AS MATERIALIZED (
          SELECT d.doc_id FROM documents d LEFT JOIN best USING (doc_id)
          WHERE LEAST(COALESCE(partner_min, d.doc_id), d.doc_id) = d.doc_id
        ), csh AS MATERIALIZED (
          SELECT DISTINCT t.doc_id, unnest($shingleCase) AS s
          FROM (SELECT toks.doc_id, toks.t FROM toks JOIN kept USING (doc_id)) t
        ), nn AS (SELECT COUNT(*) AS n FROM kept),
        rare AS (
          SELECT s FROM (SELECT s, COUNT(*) AS df FROM csh GROUP BY s) d
          CROSS JOIN nn
          WHERE df * 15 <= n AND df <= ${graft.operators.Dedup.DefaultMaxDfAbs}),
        rsh AS MATERIALIZED (SELECT csh.doc_id, csh.s FROM csh JOIN rare USING (s)),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM rsh GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter
          FROM rsh a JOIN rsh b ON a.s = b.s AND a.doc_id <> b.doc_id
          GROUP BY 1, 2),
        contained AS (
          SELECT ia AS doc_id, MIN(ib) AS contained_in
          FROM inter
          JOIN sizes sa ON sa.doc_id = ia
          JOIN sizes sb ON sb.doc_id = ib
          WHERE (sa.sz < sb.sz OR (sa.sz = sb.sz AND ia < ib))
            AND inter * 65536 // sa.sz >= 13108
          GROUP BY 1)
        SELECT d.doc_id,
               LEAST(COALESCE(b.partner_min, d.doc_id), d.doc_id) AS keep_id,
               (LEAST(COALESCE(b.partner_min, d.doc_id), d.doc_id) <> d.doc_id)
                 AS is_duplicate,
               COALESCE(c.contained_in, -1) AS contained_in,
               ((LEAST(COALESCE(b.partner_min, d.doc_id), d.doc_id) = d.doc_id)
                 AND c.contained_in IS NULL) AS keep_for_training
        FROM documents d
        LEFT JOIN best b USING (doc_id)
        LEFT JOIN contained c USING (doc_id)"""
      },
      (s, dir) => {
        val docs = graft.operators.Fanout.forKernel(
          Tables.load(s, dir, "documents"))
        val lsh = Dedup.minhashLsh(docs, "doc_id", "text",
          shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.5,
          shingleHasher = T.md5ShingleHashes)
        val kept = lsh.filter(!col("is_duplicate")).select(col("doc_id"))
        val contained = Dedup.containmentPairs(
            docs.join(kept, "doc_id"), "doc_id", "text",
            ngram = 3, maxDfShare = 15, minContainmentFp = 13108L)
          .groupBy(col("inner_id").as("doc_id"))
          .agg(min(col("outer_id")).as("contained_in"))
        lsh.join(contained, Seq("doc_id"), "left")
          .select(col("doc_id"), col("keep_id"), col("is_duplicate"),
            coalesce(col("contained_in"), lit(-1L)).as("contained_in"),
            (!col("is_duplicate") && col("contained_in").isNull)
              .as("keep_for_training"))
      }),

    // ---- q195: near-dedup with DENSIFIED ONE-PERMUTATION MinHash —
    // the 100 TB signature-stage knob: the shingle hash itself is the
    // permuted value (one evaluation per shingle instead of k), bins
    // keep their minimum, empty bins borrow rightward with a hops·C
    // offset (Shrivastava & Li 2014 rotation). Banding, hot-bucket
    // capping, exact-Jaccard verification and keeper election are the
    // q91 machinery unchanged — the FINAL pair set stays exact-verified
    // either way; only candidate recall differs (measured in q196).
    // The oracle replays bins → minima → rotation → bands from the
    // same md5 shingle hashes, C inlined from OphSignature.C. ----
    QuerySpec(
      "q195_dedup_minhash_oph",
      Some {
        val k = 32; val bands = 8; val rows = k / bands
        val cU = { // OphSignature.C as the unsigned decimal the oracle needs
          val v = graft.functions.OphSignature.C
          if (v >= 0) java.math.BigInteger.valueOf(v)
          else java.math.BigInteger.valueOf(v).add(java.math.BigInteger.ONE.shiftLeft(64))
        }
        s"""
        WITH toks AS (
          SELECT doc_id, CASE WHEN nrm = '' THEN [] ELSE string_split(nrm, ' ') END AS t
          FROM (SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS nrm
                FROM documents)
        ), sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                        ELSE list_transform(range(1, len(t) - 1),
                               i -> array_to_string(t[i:i+2], ' ')) END,
                   s -> list_reduce(list_prepend(CAST(0 AS HUGEINT),
                          list_transform(range(1, 17),
                            i -> CAST(strpos('0123456789abcdef', md5(s)[i]) - 1 AS HUGEINT))),
                          (acc, d) -> acc * 16 + d))) AS hs
          FROM toks
        ), expl AS (SELECT doc_id, unnest(hs) AS x FROM sh),
        mins AS (
          SELECT doc_id, CAST(x % $k AS BIGINT) AS b,
                 MIN(CAST(CASE WHEN x >= 9223372036854775808
                               THEN x - 18446744073709551616 ELSE x END AS BIGINT)) AS m
          FROM expl GROUP BY 1, 2
        ), dom AS (
          SELECT doc_id, unnest(range(0, $k)) AS b FROM sh
        ), filled AS (
          SELECT dom.doc_id, dom.b, mins.m
          FROM dom LEFT JOIN mins ON mins.doc_id = dom.doc_id AND mins.b = dom.b
        ), borrow AS (
          SELECT f.doc_id, f.b, MIN(h.hop) AS hops
          FROM (SELECT doc_id, b FROM filled WHERE m IS NULL) f
          CROSS JOIN (SELECT unnest(range(1, $k)) AS hop) h
          JOIN mins m ON m.doc_id = f.doc_id AND m.b = (f.b + h.hop) % $k
          GROUP BY 1, 2
        ), borrowv AS (
          SELECT br.doc_id, br.b,
                 ((CASE WHEN ms.m < 0
                        THEN CAST(ms.m AS HUGEINT) + 18446744073709551616
                        ELSE CAST(ms.m AS HUGEINT) END)
                  + CAST($cU AS HUGEINT) * br.hops)
                 % 18446744073709551616 AS du
          FROM borrow br
          JOIN mins ms ON ms.doc_id = br.doc_id AND ms.b = (br.b + br.hops) % $k
        ), dens AS (
          SELECT f.doc_id, f.b,
                 CASE WHEN f.m IS NOT NULL THEN f.m
                      WHEN bv.du IS NULL THEN 9223372036854775807
                      ELSE CAST(CASE WHEN bv.du >= 9223372036854775808
                                     THEN bv.du - 18446744073709551616
                                     ELSE bv.du END AS BIGINT)
                 END AS m
          FROM filled f
          LEFT JOIN borrowv bv ON bv.doc_id = f.doc_id AND bv.b = f.b
        ), sigs AS (
          SELECT doc_id, list(m ORDER BY b) AS sig FROM dens GROUP BY 1
        ), banded AS (
          SELECT doc_id, b, sig[b*$rows+1 : b*$rows+$rows] AS key
          FROM sigs, (SELECT unnest(range(0, $bands)) AS b)
        ), pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b
          FROM banded a JOIN banded bb
            ON a.b = bb.b AND a.key = bb.key AND a.doc_id < bb.doc_id
        ), verified AS (
          SELECT p.id_a, p.id_b
          FROM pairs p
          JOIN sh s1 ON s1.doc_id = p.id_a
          JOIN sh s2 ON s2.doc_id = p.id_b
          WHERE CASE WHEN len(list_distinct(s1.hs || s2.hs)) = 0 THEN 1.0
                     ELSE CAST(len(list_intersect(s1.hs, s2.hs)) AS DOUBLE)
                        / CAST(len(list_distinct(s1.hs || s2.hs)) AS DOUBLE) END >= 0.5
        ), best AS (
          SELECT id_b AS doc_id, MIN(id_a) AS partner_min FROM verified GROUP BY 1
        )
        SELECT d.doc_id,
               LEAST(COALESCE(partner_min, d.doc_id), d.doc_id) AS keep_id,
               LEAST(COALESCE(partner_min, d.doc_id), d.doc_id) <> d.doc_id AS is_duplicate
        FROM documents d LEFT JOIN best USING (doc_id)"""
      },
      (s, dir) => Dedup.minhashLsh(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.5,
        shingleHasher = T.md5ShingleHashes, ophDensified = true)),

    // ---- q196: OPH CANDIDATE-RECALL EVALUATION — the q188 harness
    // pointed at the densified one-permutation signature: exact Jaccard
    // truth over the same bounded eval slice, LEFT-joined against the
    // OPH banding's pre-verification candidates (threshold 0). This is
    // the measurement that licenses q195's k-fold cheaper signature:
    // the recall S-curve it trades away is quantified per similarity
    // decile, on the actual corpus, under the hash oracle. ----
    QuerySpec(
      "q196_oph_recall_eval",
      Some {
        val k = 32; val bands = 8; val rows = k / bands
        val cU = {
          val v = graft.functions.OphSignature.C
          if (v >= 0) java.math.BigInteger.valueOf(v)
          else java.math.BigInteger.valueOf(v).add(java.math.BigInteger.ONE.shiftLeft(64))
        }
        s"""
        WITH toks AS (
          SELECT doc_id, CASE WHEN nrm = '' THEN [] ELSE string_split(nrm, ' ') END AS t
          FROM (SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS nrm
                FROM documents WHERE doc_id < 300)
        ), sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                        ELSE list_transform(range(1, len(t) - 1),
                               i -> array_to_string(t[i:i+2], ' ')) END,
                   s -> list_reduce(list_prepend(CAST(0 AS HUGEINT),
                          list_transform(range(1, 17),
                            i -> CAST(strpos('0123456789abcdef', md5(s)[i]) - 1 AS HUGEINT))),
                          (acc, d) -> acc * 16 + d))) AS hs
          FROM toks
        ), expl AS (SELECT doc_id, unnest(hs) AS x FROM sh),
        mins AS (
          SELECT doc_id, CAST(x % $k AS BIGINT) AS b,
                 MIN(CAST(CASE WHEN x >= 9223372036854775808
                               THEN x - 18446744073709551616 ELSE x END AS BIGINT)) AS m
          FROM expl GROUP BY 1, 2
        ), dom AS (
          SELECT doc_id, unnest(range(0, $k)) AS b FROM sh
        ), filled AS (
          SELECT dom.doc_id, dom.b, mins.m
          FROM dom LEFT JOIN mins ON mins.doc_id = dom.doc_id AND mins.b = dom.b
        ), borrow AS (
          SELECT f.doc_id, f.b, MIN(h.hop) AS hops
          FROM (SELECT doc_id, b FROM filled WHERE m IS NULL) f
          CROSS JOIN (SELECT unnest(range(1, $k)) AS hop) h
          JOIN mins m ON m.doc_id = f.doc_id AND m.b = (f.b + h.hop) % $k
          GROUP BY 1, 2
        ), borrowv AS (
          SELECT br.doc_id, br.b,
                 ((CASE WHEN ms.m < 0
                        THEN CAST(ms.m AS HUGEINT) + 18446744073709551616
                        ELSE CAST(ms.m AS HUGEINT) END)
                  + CAST($cU AS HUGEINT) * br.hops)
                 % 18446744073709551616 AS du
          FROM borrow br
          JOIN mins ms ON ms.doc_id = br.doc_id AND ms.b = (br.b + br.hops) % $k
        ), dens AS (
          SELECT f.doc_id, f.b,
                 CASE WHEN f.m IS NOT NULL THEN f.m
                      WHEN bv.du IS NULL THEN 9223372036854775807
                      ELSE CAST(CASE WHEN bv.du >= 9223372036854775808
                                     THEN bv.du - 18446744073709551616
                                     ELSE bv.du END AS BIGINT)
                 END AS m
          FROM filled f
          LEFT JOIN borrowv bv ON bv.doc_id = f.doc_id AND bv.b = f.b
        ), sigs AS (
          SELECT doc_id, list(m ORDER BY b) AS sig FROM dens GROUP BY 1
        ), banded AS (
          SELECT doc_id, b, sig[b*$rows+1 : b*$rows+$rows] AS key
          FROM sigs, (SELECT unnest(range(0, $bands)) AS b)
        ), cand AS (
          SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b
          FROM banded a JOIN banded bb
            ON a.b = bb.b AND a.key = bb.key AND a.doc_id < bb.doc_id
        ), truth AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 len(list_intersect(a.hs, b.hs)) AS inter,
                 len(list_distinct(a.hs || b.hs)) AS uni
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE len(list_intersect(a.hs, b.hs)) > 0
        )
        SELECT CAST((inter * 10) // uni AS BIGINT) AS bucket,
               COUNT(*) AS n_truth,
               CAST(SUM(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_hit,
               CAST(SUM(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END) * 65536
                 // COUNT(*) AS BIGINT) AS recall_fp
        FROM truth t
        LEFT JOIN cand c ON c.id_a = t.id_a AND c.id_b = t.id_b
        GROUP BY 1"""
      },
      (s, dir) => {
        val slice = Tables.load(s, dir, "documents").filter(col("doc_id") < 300)
        val sh = slice.select(col("doc_id").cast("long").as("doc_id"),
            T.md5ShingleHashes(col("text"), 3).as("sh"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val truth = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
          .crossJoin(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("inter"),
            size(array_union(col("sh_a"), col("sh_b"))).cast("long").as("uni"))
          .filter(col("inter") > 0)
          .withColumn("bucket", expr("(inter * 10) div uni"))
        val cand = Dedup.minhashCandidatePairs(slice, "doc_id", "text",
            shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.0,
            shingleHasher = T.md5ShingleHashes, ophDensified = true)
          .select(col("id_a").cast("long").as("id_a"),
            col("id_b").cast("long").as("id_b"))
          .withColumn("hit", lit(1L))
        truth.join(cand, Seq("id_a", "id_b"), "left")
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_truth"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .withColumn("recall_fp", expr("(n_hit * 65536) div n_truth"))
      }),

    // ---- q40: embedding near-dup keeper election ----
    QuerySpec(
      "q40_dedup_embedding",
      None,
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        Dedup.keeperFrom(emb, "vec_id",
          Similarity.embeddingNearDupPairs(emb, "vec_id", "embedding",
            threshold = 0.4, planesPerBand = 8))
      }),

    // ---- q41: exact brute-force cosine top-k ----
    QuerySpec(
      "q41_ann_bruteforce_topk",
      None,
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        Similarity.bruteForceTopK(
          emb, "vec_id",
          emb.filter(col("vec_id") < 20).withColumnRenamed("vec_id", "query_id"),
          "query_id", "embedding", k = 5)
      }),

    // ---- q42: LSH-bucketed cosine top-k (scale path). probeBits=1
    // (multi-probe, round 4): same bit-identical results, but the
    // corpus explodes into 4 chunks instead of 7 and each chunk widens
    // 2→4 bits — probe rows move to the broadcast query side ----
    QuerySpec(
      "q42_ann_lsh_topk",
      None,
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        Similarity.lshTopK(
          emb, "vec_id",
          emb.filter(col("vec_id") < 20).withColumnRenamed("vec_id", "query_id"),
          "query_id", "embedding", k = 5, planes = 16, maxHamming = 6,
          probeBits = 1)
      }),

    // ---- q44: IVF-accelerated cosine top-k (coarse quantize + probe) ----
    QuerySpec(
      "q44_ann_ivf_topk",
      None,
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        Similarity.ivfTopK(
          emb, "vec_id",
          emb.filter(col("vec_id") < 20).withColumnRenamed("vec_id", "query_id"),
          "query_id", "embedding", k = 5, nLists = 16, nProbe = 6)
      }),

    // ---- q49: IVF with TRAINED centroids (distributed Lloyd's k-means,
    // 3 iterations) — same probe shape as q44, better-balanced lists ----
    QuerySpec(
      "q49_ann_ivf_kmeans_topk",
      None,
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val centroids = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
          k = 16, iters = 3)
        Similarity.ivfTopK(
          emb, "vec_id",
          emb.filter(col("vec_id") < 20).withColumnRenamed("vec_id", "query_id"),
          "query_id", "embedding", k = 5, nLists = 16, nProbe = 6,
          trainedCentroids = Some(centroids))
      }),

    // ---- q43: multimodal column plumbing — opaque binary + metadata ----
    QuerySpec(
      "q43_media_meta",
      Some("""
        SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len,
               CASE WHEN doc_id % 3 = 0 THEN 'jpeg'
                    WHEN doc_id % 3 = 1 THEN 'png'
                    ELSE 'webp' END AS format
        FROM documents"""),
      (s, dir) =>
        graft.operators.Multimodal
          .withPayload(Tables.load(s, dir, "documents"), "doc_id", "text")
          .select(
            col("doc_id"),
            octet_length(col("payload")).cast("long").as("byte_len"),
            col("format"))),

    // ---- q117: sub-document chunk dedup — the CCNet/Dolma-style
    // "duplicated paragraph fraction" quality signal, with fixed
    // 10-token chunks standing in for paragraphs (the synthetic corpus
    // has no newlines). Keeper = corpus-wide first occurrence in
    // (doc_id, chunk_idx) order; the oracle replays the identical
    // chunk grid via DuckDB list slicing over a lateral range(). ----
    QuerySpec(
      "q117_chunk_dup_stats",
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        chunks AS (
          SELECT doc_id, i AS chunk_idx,
                 array_to_string(ts[(i*10+1):(i*10+10)], ' ') AS chunk
          FROM toks, UNNEST(range(CAST(CEIL(LEN(ts)/10.0) AS BIGINT))) AS t(i)),
        flagged AS (
          SELECT doc_id, chunk_idx,
                 CASE WHEN doc_id*1000000 + chunk_idx
                      = MIN(doc_id*1000000 + chunk_idx) OVER (PARTITION BY md5(chunk))
                      THEN 0 ELSE 1 END AS dup
          FROM chunks)
        SELECT doc_id, COUNT(*) AS n_chunks, CAST(SUM(dup) AS BIGINT) AS n_dup
        FROM flagged GROUP BY doc_id"""),
      (s, dir) =>
        Dedup.chunkDupStats(
          Tables.load(s, dir, "documents"), "doc_id", "text", chunkTokens = 10)),

    // ---- q121: Gopher/Dolma-style repetition signals — per-doc counts
    // behind the "fraction of tokens in the most common token / bigram"
    // quality filters. All-integer output (counts, not ratios) so the
    // oracle hashes exactly; callers derive the fractions. Scale shape:
    // token and bigram explodes feed (doc_id, gram)-keyed partial
    // aggregations — two exchanges on near-uniform high-cardinality
    // keys, no joins wider than the doc-grain stats. ----
    QuerySpec(
      "q121_repetition_signals",
      Some("""
        WITH norm AS (
          SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS nrm
          FROM documents
        ), toks AS (
          SELECT doc_id, string_split(nrm, ' ') AS t FROM norm
        ), tok AS (
          SELECT doc_id, unnest(t) AS w FROM toks
        ), tc AS (
          SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY 1, 2
        ), tstats AS (
          SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                 CAST(MAX(c) AS BIGINT) AS top_token_count
          FROM tc GROUP BY 1
        ), bg AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(t) - 1),
                   p -> array_to_string(t[p:p+1], ' '))) AS b
          FROM toks
        ), bc AS (
          SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2
        ), bstats AS (
          SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram_count FROM bc GROUP BY 1
        )
        SELECT t.doc_id, n_tokens, top_token_count,
               COALESCE(top_bigram_count, CAST(0 AS BIGINT)) AS top_bigram_count
        FROM tstats t LEFT JOIN bstats USING (doc_id)"""),
      (s, dir) => {
        val toks = graft.operators.Fanout
          .forKernel(Tables.load(s, dir, "documents"))
          .select(col("doc_id"), split(T.normalizeText(col("text")), " ").as("t"))
        val tstats = toks.select(col("doc_id"), explode(col("t")).as("w"))
          .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).cast("long").as("n_tokens"),
            max(col("c")).cast("long").as("top_token_count"))
        val bstats = toks.select(col("doc_id"), explode(
            when(size(col("t")) < 2, array().cast("array<string>"))
              .otherwise(transform(sequence(lit(0), size(col("t")) - 2),
                i => concat_ws(" ", slice(col("t"), i + 1, lit(2)))))).as("b"))
          .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(max(col("c")).cast("long").as("top_bigram_count"))
        tstats.join(bstats, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"), col("top_token_count"),
            coalesce(col("top_bigram_count"), lit(0L)).as("top_bigram_count"))
      }),

    // ---- q122: token-budget mix sampling — the "data mixing" pass: per
    // language, admit documents in deterministic pseudo-random order
    // until a token budget fills (a doc is admitted if it STARTS before
    // the budget line, so the budget is met, not undershot). r14 shape:
    // the q89 bucket decomposition, NOT one running-sum window per
    // language (which funnels a language's ENTIRE corpus through one
    // reducer to select ~budget docs). Bucket-grain prefix sums run in
    // a window bounded by the 10⁶ hash-order domain regardless of
    // corpus size; only the under-budget buckets (≤ budget+zone rows
    // per language) join back — broadcast — and the per-doc running
    // sum partitions by (lang, bucket), each partition corpus/10⁶.
    // Total order (hash bucket, then id) is the window form's order,
    // so results are identical. ----
    QuerySpec(
      "q122_token_budget_sample",
      Some(s"""
        WITH t AS (
          SELECT doc_id, lang,
                 CASE WHEN nrm = '' THEN 0
                      ELSE CAST(LEN(STRING_SPLIT(nrm, ' ')) AS BIGINT) END AS n_tokens
          FROM (SELECT doc_id, lang,
                       regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS nrm
                FROM documents)
        ), c AS (
          SELECT doc_id, lang, n_tokens,
                 CAST(SUM(n_tokens) OVER (
                   PARTITION BY lang
                   ORDER BY ${graft.Exact.hashOrderSql("doc_id", 1000000)}, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_tokens
          FROM t
        )
        SELECT doc_id, lang, n_tokens, cum_tokens
        FROM c WHERE cum_tokens - n_tokens < 2000"""),
      (s, dir) => {
        val budget = 2000L
        val t = graft.operators.Fanout.forKernel(Tables.load(s, dir, "documents"))
          .select(col("doc_id"), col("lang"),
            T.tokenCount(col("text")).as("n_tokens"),
            graft.Exact.hashOrder(col("doc_id"), 1000000).as("_hb"))
        // bucket-grain prefix sums: the window's partitions are bounded
        // by the hash-order domain, never by corpus size
        val bucketPrefix = t.groupBy(col("lang"), col("_hb"))
          .agg(sum(col("n_tokens")).as("_bt"))
          .withColumn("_prefix", coalesce(sum(col("_bt")).over(
            Window.partitionBy("lang").orderBy("_hb")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .filter(col("_prefix") < budget)
          .select(col("lang"), col("_hb"), col("_prefix"))
        val wDoc = Window.partitionBy(col("lang"), col("_hb"))
          .orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t.join(broadcast(bucketPrefix), Seq("lang", "_hb"))
          .withColumn("cum_tokens",
            (col("_prefix") + sum(col("n_tokens")).over(wDoc)).cast("long"))
          .filter(col("cum_tokens") - col("n_tokens") < budget)
          .select(col("doc_id"), col("lang"), col("n_tokens"), col("cum_tokens"))
      }),

    // ---- q123: contamination overlap REPORT — per eval document, how
    // many corpus documents share ≥1 13-gram and how many distinct
    // grams leak (q85 filters; audits need the counts). Production
    // family (xxhash64 grams) on the Spark side; the oracle replays md5
    // grams — the OUTPUT (distinct doc/gram counts) is family-invariant,
    // same argument as q85. Eval grams broadcast; the corpus explodes
    // map-side into the join and only matches shuffle (keyed by the
    // tiny eval id set — bounded by |eval| × grams). ----
    QuerySpec(
      "q123_contamination_stats",
      Some("""
        WITH norm AS (
          SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS nrm
          FROM documents
        ), toks AS (
          SELECT doc_id, string_split(nrm, ' ') AS t FROM norm
        ), grams AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(t) - 12),
                   p -> md5(array_to_string(t[p:p+12], ' ')))) AS g
          FROM toks
        ), eg AS (
          SELECT DISTINCT doc_id AS eval_id, g FROM grams WHERE doc_id % 10 = 0
        ), cg AS (
          SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 10 <> 0
        )
        SELECT eval_id, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_hit,
               CAST(COUNT(DISTINCT g) AS BIGINT) AS n_grams_hit
        FROM eg JOIN cg USING (g) GROUP BY 1"""),
      (s, dir) => {
        val docs = graft.operators.Fanout
          .forKernel(Tables.load(s, dir, "documents"))
        def grams(df: org.apache.spark.sql.DataFrame) = {
          val toks = split(T.normalizeText(col("text")), " ")
          df.select(col("doc_id"), explode(
              when(size(toks) >= 13,
                transform(sequence(lit(0), size(toks) - 13),
                  p => xxhash64(concat_ws(" ", slice(toks, p + 1, lit(13))))))
                .otherwise(array().cast("array<bigint>"))).as("g"))
            .distinct()
        }
        val eg = grams(docs.filter(col("doc_id") % 10 === 0))
          .withColumnRenamed("doc_id", "eval_id")
        val cg = grams(docs.filter(col("doc_id") % 10 =!= 0))
        cg.join(broadcast(eg), Seq("g"))
          .groupBy(col("eval_id"))
          .agg(countDistinct(col("doc_id")).as("n_docs_hit"),
            countDistinct(col("g")).as("n_grams_hit"))
      }),

    // ---- q124: rare-token / document-frequency profile — the
    // integer-exact stand-in for LM-perplexity quality filtering
    // (transcendental log diverges in the last ulp across engines, so
    // the CCNet-style score ships as counts: distinct vocabulary size,
    // hapax-legomena count, and summed corpus document frequency —
    // callers derive rarity ratios).
    //
    // SKEW-SPLIT join (the default path since r7): the token-keyed
    // join-back's key distribution is Zipfian — a stopword like "the"
    // appears in nearly every document, so the plain tok⋈df equi-join
    // ships |corpus| rows of ONE key to one reducer at 100 TB. A
    // Misra-Gries pre-pass (bounded ≤k state, summaries merge
    // map-side, q129's aggregator) finds the heavy head; every token
    // OUTSIDE the head is guaranteed df ≤ n/(k+1), so:
    //   heavy tokens → exact dfs aggregated (partial agg collapses the
    //     hot keys map-side) and BROADCAST back — the hot keys never
    //     shuffle the (doc,token) frame;
    //   light tokens → the normal equi-join, now provably unskewed.
    // Both branches compute exact counts, so the union is bit-identical
    // to the naive plan and the oracle (the exact spec) stays the gate.
    // MG's candidate SET varies with partition order; the output does
    // not. At 100 TB, persist `tok` across the two passes. ----
    QuerySpec(
      "q124_rare_token_profile",
      Some("""
        WITH norm AS (
          SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS nrm
          FROM documents
        ), toks AS (
          SELECT doc_id, string_split(nrm, ' ') AS t FROM norm
        ), tok AS (
          SELECT DISTINCT doc_id, w
          FROM (SELECT doc_id, unnest(t) AS w FROM toks)
        ), df AS (
          SELECT w, COUNT(*) AS df FROM tok GROUP BY 1
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
               CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
               CAST(SUM(df) AS BIGINT) AS sum_df
        FROM tok JOIN df USING (w)
        GROUP BY 1"""),
      (s, dir) => {
        import s.implicits._
        // persisted: the (doc_id, w) frame feeds THREE consumers (the
        // sampled MG head, the heavy semi-join, the light anti-join) —
        // uncached, each re-runs the explode + distinct exchange. The
        // frame is NARROW (id + token), the cheap-to-cache case, unlike
        // the wide shingle arrays SCALING.md warns about. Session-
        // lifetime cache, per the operator-wide caching note.
        val tok = graft.operators.Fanout
          .forKernel(Tables.load(s, dir, "documents"))
          .select(col("doc_id"),
            explode(split(T.normalizeText(col("text")), " ")).as("w"))
          .distinct()
          .persist()
        // bounded-state heavy-hitter head (≤1024 driver-side strings),
        // computed on a 10% SAMPLE: membership only routes keys between
        // the two exact branches, so a sampled head cannot affect the
        // result — it only needs to catch the skew-dominating tokens,
        // which sit far above the sampled n/(k+1) threshold
        val head = tok.sample(withReplacement = false, 0.1, seed = 42)
          .select(col("w")).as[String]
          .select(new graft.operators.MisraGries(1024).toColumn)
          .head().keys.toSeq
        val heavy = broadcast(head.toDF("w"))
        val tokHeavy = tok.join(heavy, Seq("w"), "left_semi")
        val tokLight = tok.join(heavy, Seq("w"), "left_anti")
        val dfHeavy = tokHeavy.groupBy(col("w")).agg(count(lit(1)).as("df"))
        val dfLight = tokLight.groupBy(col("w")).agg(count(lit(1)).as("df"))
        tokLight.join(dfLight, Seq("w"))
          .unionByName(tokHeavy.join(broadcast(dfHeavy), Seq("w")))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_distinct_tokens"),
            sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_hapax"),
            sum(col("df")).cast("long").as("sum_df"))
      }),

    // ---- q125: leakage-safe train/valid/test split — duplicate groups
    // must co-assign or eval leaks through near-copies of training
    // docs. Exact-dup groups (q30's content-hash keeper) share their
    // keeper id, and the split is the keeper's deterministic hash
    // bucket — keeper election via aggregate + hash-grain join-back
    // (the Dedup.exact r14 rationale: no hot-clique window partition),
    // the same overflow-proof hash order as q48/q122. ----
    QuerySpec(
      "q125_leakage_safe_split",
      Some(s"""
        WITH k AS (
          SELECT doc_id,
                 MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
          FROM documents
        )
        SELECT doc_id, keep_id,
               CASE WHEN hb < 80 THEN 'train'
                    WHEN hb < 90 THEN 'valid'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id, keep_id,
                     ${graft.Exact.hashOrderSql("keep_id", 100)} AS hb
              FROM k)"""),
      (s, dir) => {
        val hb = graft.Exact.hashOrder(col("keep_id"), 100)
        val hashed = Tables.load(s, dir, "documents")
          .select(col("doc_id"), md5(col("text")).as("_h"))
        hashed
          .join(hashed.groupBy(col("_h")).agg(min(col("doc_id")).as("keep_id")),
            Seq("_h"))
          .select(col("doc_id"), col("keep_id"),
            when(hb < 80, "train").when(hb < 90, "valid")
              .otherwise("test").as("split"))
      }),

    // ---- q127: fuzzy prefix matching — edit-distance-1 pairs over
    // normalized 24-char prefixes via FuzzyJoin's symmetric-delete
    // candidates (signature explode → variant equi-join → levenshtein
    // verify; never a cross join). The ORACLE is the quadratic spec —
    // a brute levenshtein over all pairs, affordable at gate scale —
    // so the hash gate proves the optimized path computes exactly the
    // naive definition. ----
    QuerySpec(
      "q127_fuzzy_prefix_pairs",
      Some("""
        WITH p AS (
          SELECT doc_id,
                 substr(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
                        1, 24) AS s
          FROM documents
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        FROM p a JOIN p b ON a.doc_id < b.doc_id
        WHERE levenshtein(a.s, b.s) <= 1"""),
      (s, dir) =>
        graft.operators.FuzzyJoin.editDistance1SelfPairs(
          Tables.load(s, dir, "documents")
            .select(col("doc_id"),
              substring(T.normalizeText(col("text")), 1, 24).as("s")),
          "doc_id", "s")
          .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))),

    // ---- q129: per-language frequent tokens via the Misra-Gries
    // bounded-state aggregator — the token grain never shuffles (each
    // partition reduces to a ≤k-entry summary map-side; only summaries
    // cross the exchange). Capacity 1024 ≫ the corpus vocabulary, so
    // this gate instance runs in MG's EXACT regime and the oracle is
    // the plain count — the approximate regime's n/(k+1) guarantee is
    // asserted in FrequentItemsSpec with tiny k. ----
    QuerySpec(
      "q129_frequent_tokens_by_lang",
      Some("""
        SELECT lang, w, COUNT(*) AS cnt
        FROM (SELECT lang,
                     unnest(string_split(
                       regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
                       ' ')) AS w
              FROM documents)
        GROUP BY 1, 2"""),
      (s, dir) => {
        import s.implicits._
        val mg = new graft.operators.MisraGries(1024)
        graft.operators.Fanout.forKernel(Tables.load(s, dir, "documents"))
          .select(col("lang"),
            explode(split(T.normalizeText(col("text")), " ")).as("w"))
          .as[(String, String)]
          .groupByKey(_._1).mapValues(_._2)
          .agg(mg.toColumn)
          .flatMap { case (lang, counts) =>
            counts.iterator.map { case (w, c) => (lang, w, c) } }
          .toDF("lang", "w", "cnt")
      }),

    // ---- q130: incremental ingest dedup — docs with doc_id % 5 = 0
    // play the existing corpus INDEX (its stored content hashes); the
    // rest arrive as tonight's batch. Survivors = batch keepers (min
    // id per normalized-content group) whose content the index lacks.
    // The engine runs the bloom-gated path (Dedup.dedupIncremental:
    // broadcast filter, map-side negatives, positives-only anti-join);
    // DuckDB replays the definition directly — the hash gate proves
    // the bloom shortcut computes the exact spec. NOT EXISTS (not
    // NOT IN): a null hash must behave like the anti-join. ----
    QuerySpec(
      "q130_incremental_dedup",
      Some("""
        WITH inc AS (
          SELECT doc_id,
                 md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS content_hash
          FROM documents WHERE doc_id % 5 <> 0
        ), idx AS (
          SELECT DISTINCT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS h
          FROM documents WHERE doc_id % 5 = 0
        ), keep AS (
          SELECT doc_id, content_hash,
                 MIN(doc_id) OVER (PARTITION BY content_hash) AS keep_id
          FROM inc
        )
        SELECT doc_id, content_hash
        FROM keep
        WHERE doc_id = keep_id
          AND NOT EXISTS (SELECT 1 FROM idx WHERE idx.h = keep.content_hash)"""),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val index = docs.filter(col("doc_id") % 5 === 0)
          .select(md5(T.normalizeText(col("text"))).as("h"))
        graft.operators.Dedup.dedupIncremental(
            docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text",
            index, "h")
          .select(col("doc_id"), col("content_hash"))
      }),

    // ---- q131: filter funnel with reason codes — the audit report
    // every production cleaning pipeline publishes: each document is
    // tagged with its FIRST-failing rule (too_short → non_english →
    // low_quality → kept), so per-reason counts explain exactly where
    // the corpus shrinks and rule ORDER is part of the contract. One
    // scan, zero exchanges (all kernels per-row; quality_score is
    // q33's bit-identical IEEE formula, so the 0.8 threshold compares
    // identically across engines). The kernel-predicted-language
    // variant of rule 2 is q35's langId; metadata lang keeps this
    // oracle compact. ----
    QuerySpec(
      "q131_filter_funnel",
      Some("""
        WITH norm AS (
          SELECT doc_id, lang,
                 regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS nrm
          FROM documents
        ), base AS (
          SELECT doc_id, lang,
                 CAST(LENGTH(nrm) AS DOUBLE) AS n_chars_d,
                 CASE WHEN LENGTH(nrm) = 0 THEN CAST(0 AS DOUBLE)
                      ELSE CAST(LEN(STRING_SPLIT(nrm, ' ')) AS DOUBLE) END AS n_toks_d,
                 CAST(LENGTH(regexp_replace(nrm, '[^a-z]', '', 'g')) AS DOUBLE) AS alpha,
                 CAST(LENGTH(regexp_replace(nrm, '[^.,;:!?''"()]', '', 'g')) AS DOUBLE) AS punct,
                 CAST(
                   CAST((LENGTH(' '||nrm||' ') - LENGTH(REPLACE(' '||nrm||' ', ' the ', '')))/5 AS BIGINT)
                 + CAST((LENGTH(' '||nrm||' ') - LENGTH(REPLACE(' '||nrm||' ', ' a ', '')))/3 AS BIGINT)
                 + CAST((LENGTH(' '||nrm||' ') - LENGTH(REPLACE(' '||nrm||' ', ' and ', '')))/5 AS BIGINT)
                 + CAST((LENGTH(' '||nrm||' ') - LENGTH(REPLACE(' '||nrm||' ', ' of ', '')))/4 AS BIGINT)
                 + CAST((LENGTH(' '||nrm||' ') - LENGTH(REPLACE(' '||nrm||' ', ' to ', '')))/4 AS BIGINT)
                 + CAST((LENGTH(' '||nrm||' ') - LENGTH(REPLACE(' '||nrm||' ', ' in ', '')))/4 AS BIGINT)
                 + CAST((LENGTH(' '||nrm||' ') - LENGTH(REPLACE(' '||nrm||' ', ' is ', '')))/4 AS BIGINT)
                 AS DOUBLE) AS stop_d
          FROM norm
        ), scored AS (
          SELECT doc_id, lang, n_toks_d,
                 (CASE WHEN n_toks_d BETWEEN 5 AND 100000
                        AND (n_chars_d - (n_toks_d - 1)) / GREATEST(n_toks_d, 1.0) BETWEEN 2 AND 12
                       THEN 1.0 ELSE 0.0 END * 0.4)
                 + (alpha / GREATEST(n_chars_d, 1.0) * 0.3)
                 + (LEAST(stop_d / GREATEST(n_toks_d, 1.0) * 5, 1.0) * 0.2)
                 + ((1.0 - LEAST(punct / GREATEST(n_chars_d, 1.0) * 5, 1.0)) * 0.1) AS q
          FROM base
        )
        SELECT doc_id,
               CASE WHEN n_toks_d < 24 THEN 'too_short'
                    WHEN lang <> 'en' THEN 'non_english'
                    WHEN q < 0.8 THEN 'low_quality'
                    ELSE 'kept' END AS reason
        FROM scored"""),
      (s, dir) =>
        graft.operators.Fanout.forKernel(Tables.load(s, dir, "documents"))
          .select(col("doc_id"), col("lang"),
            T.qualityMetrics(col("text")).as("m"))
          .select(col("doc_id"),
            when(col("m.n_tokens") < 24, "too_short")
              .when(col("lang") =!= "en", "non_english")
              .when(col("m.quality_score") < 0.8, "low_quality")
              .otherwise("kept").as("reason"))),

    // ---- q132: substring-level exact dedup — repeated long substrings
    // ACROSS documents (boilerplate/license text, the suffix-array
    // regime of Lee et al. 2022). Content-defined chunk boundaries
    // (rolling w-gram hash anchors, CdcChunks) so two copies of a
    // repeat chunk identically at any offset; per-doc maximal runs of
    // corpus-duplicated chunks ≥ 80 code points are reported. The
    // oracle replays the IDENTICAL definition: window hashes via
    // list_reduce over the same B/M/p constants, chunk identity via
    // md5 of the same 1-based substring, the same run-merge window.
    // Spark computes the hash rolling in one O(n) kernel pass; DuckDB
    // recomputes each window directly — same values by construction. ----
    QuerySpec(
      "q132_substring_dups",
      Some("""
        WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        hpos AS (
          SELECT doc_id, i,
                 list_reduce(
                   list_transform(generate_series(0, 7),
                     j -> ascii(substring(text, CAST(i + j AS INT), 1))),
                   (a, c) -> (a * 31 + c) % 1000003) AS hv
          FROM d, UNNEST(generate_series(2, n - 7)) AS t(i)
        ),
        bounds AS (
          SELECT doc_id, CAST(1 AS BIGINT) AS b FROM d
          UNION ALL SELECT doc_id, i FROM hpos WHERE hv % 32 = 0
          UNION ALL SELECT doc_id, CAST(n + 1 AS BIGINT) FROM d
        ),
        chunks AS (
          SELECT doc_id, b AS cstart,
                 lead(b) OVER (PARTITION BY doc_id ORDER BY b) - b AS clen
          FROM bounds
        ),
        ch AS (
          SELECT c.doc_id, cstart, clen,
                 md5(substring(d.text, CAST(cstart AS INT), CAST(clen AS INT))) AS chash
          FROM chunks c JOIN d USING (doc_id)
          WHERE clen IS NOT NULL AND clen > 0
        ),
        dup AS (
          SELECT doc_id, cstart, clen
          FROM (SELECT doc_id, cstart, clen,
                       COUNT(*) OVER (PARTITION BY chash) AS cnt FROM ch)
          WHERE cnt > 1
        ),
        runs AS (
          SELECT doc_id, cstart, clen,
                 CASE WHEN cstart = lag(cstart + clen)
                        OVER (PARTITION BY doc_id ORDER BY cstart)
                      THEN 0 ELSE 1 END AS brk
          FROM dup
        ),
        sp AS (
          SELECT doc_id, cstart, clen,
                 SUM(brk) OVER (PARTITION BY doc_id ORDER BY cstart
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM runs
        )
        SELECT doc_id, CAST(MIN(cstart) AS BIGINT) AS span_start,
               CAST(SUM(clen) AS BIGINT) AS span_len,
               CAST(COUNT(*) AS BIGINT) AS n_chunks
        FROM sp GROUP BY doc_id, sid
        HAVING CAST(SUM(clen) AS BIGINT) >= 80"""),
      (s, dir) =>
        graft.operators.Dedup.substringDups(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          minLen = 80, w = 8, p = 32)),

    // ---- q133: pixel decode under the hash gate — the ImageIO decode
    // path (Multimodal.decodePixels) was test-only through r7. Each doc
    // synthesizes a real PNG whose dimensions and pixels are a
    // closed-form function of (id, x, y) (Multimodal.synthesizeImages);
    // the engine runs the genuine encode → ImageIO decode → per-image
    // aggregation loop, while the oracle computes the same statistics
    // straight from the formula — equal because PNG is lossless. Means
    // are one IEEE double division of exact integers on both engines;
    // the 16-bin BT.601 luma histogram flattens to columns so every
    // bin hashes. ----
    QuerySpec(
      "q133_pixel_decode",
      Some("""
        WITH dims AS (
          SELECT doc_id,
                 CAST(4 + doc_id % 5 AS INT) AS width,
                 CAST(4 + doc_id % 3 AS INT) AS height
          FROM documents),
        px AS (
          SELECT doc_id, width, height,
                 (7*doc_id + 13*x + 31*y) % 256 AS r,
                 (11*doc_id + 17*x + 23*y) % 256 AS g,
                 (5*doc_id + 19*x + 29*y) % 256 AS b
          FROM dims, UNNEST(range(width)) AS tx(x), UNNEST(range(height)) AS ty(y)),
        lum AS (
          SELECT doc_id, width, height, r, g, b,
                 ((r*299 + g*587 + b*114) // 1000) // 16 AS bin
          FROM px)
        SELECT doc_id, width, height,
               CAST(SUM(r) AS DOUBLE) / (width*height) AS mean_r,
               CAST(SUM(g) AS DOUBLE) / (width*height) AS mean_g,
               CAST(SUM(b) AS DOUBLE) / (width*height) AS mean_b,
               CAST(SUM(CASE WHEN bin = 0 THEN 1 ELSE 0 END) AS BIGINT) AS h00,
               CAST(SUM(CASE WHEN bin = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h01,
               CAST(SUM(CASE WHEN bin = 2 THEN 1 ELSE 0 END) AS BIGINT) AS h02,
               CAST(SUM(CASE WHEN bin = 3 THEN 1 ELSE 0 END) AS BIGINT) AS h03,
               CAST(SUM(CASE WHEN bin = 4 THEN 1 ELSE 0 END) AS BIGINT) AS h04,
               CAST(SUM(CASE WHEN bin = 5 THEN 1 ELSE 0 END) AS BIGINT) AS h05,
               CAST(SUM(CASE WHEN bin = 6 THEN 1 ELSE 0 END) AS BIGINT) AS h06,
               CAST(SUM(CASE WHEN bin = 7 THEN 1 ELSE 0 END) AS BIGINT) AS h07,
               CAST(SUM(CASE WHEN bin = 8 THEN 1 ELSE 0 END) AS BIGINT) AS h08,
               CAST(SUM(CASE WHEN bin = 9 THEN 1 ELSE 0 END) AS BIGINT) AS h09,
               CAST(SUM(CASE WHEN bin = 10 THEN 1 ELSE 0 END) AS BIGINT) AS h10,
               CAST(SUM(CASE WHEN bin = 11 THEN 1 ELSE 0 END) AS BIGINT) AS h11,
               CAST(SUM(CASE WHEN bin = 12 THEN 1 ELSE 0 END) AS BIGINT) AS h12,
               CAST(SUM(CASE WHEN bin = 13 THEN 1 ELSE 0 END) AS BIGINT) AS h13,
               CAST(SUM(CASE WHEN bin = 14 THEN 1 ELSE 0 END) AS BIGINT) AS h14,
               CAST(SUM(CASE WHEN bin = 15 THEN 1 ELSE 0 END) AS BIGINT) AS h15
        FROM lum
        GROUP BY doc_id, width, height"""),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val px = graft.operators.Multimodal.decodePixels(
          graft.operators.Multimodal.synthesizeImages(
            graft.operators.Fanout.forKernel(docs), "doc_id"), "doc_id")
        val base = Seq(
          col("doc_id"), col("width"), col("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))
        val hist = (0 until 16).map(i =>
          col("luma_hist").getItem(i).as(f"h$i%02d"))
        px.toDF().select(base ++ hist: _*)
      }),

    // ---- q152: image perceptual near-dup (dHash) — multimodal dedup,
    // the one pipeline staple the q43/q133 stack didn't yet feed. Each
    // doc synthesizes a real PNG from the near-dup fixture (groups of 5
    // share a base pattern, members flip one pixel); the engine runs
    // genuine encode → ImageIO decode → 9×8 nearest-sample dHash, then
    // Hamming-ball pairs via the SimHash pigeonhole chunk join
    // (Dedup.hammingPairs — banded equi-join + popcount verify, never
    // all-pairs). The oracle computes the hash bit-for-bit from the
    // pixel formula (PNG lossless) as four 16-bit chunks — no 64-bit
    // overflow — and brute-forces pairs, which at oracle scale is the
    // quarantined baseline the banding provably equals (4 chunks ⊇ any
    // Hamming≤3 pair by pigeonhole). ----
    QuerySpec(
      "q152_image_dhash_pairs",
      Some("""
        WITH geom AS (
          SELECT doc_id, doc_id // 5 AS g, CAST(doc_id % 5 AS INT) AS m,
                 CAST(8 + (doc_id // 5) % 3 AS INT) AS w,
                 CAST(8 + (doc_id // 5) % 2 AS INT) AS h
          FROM documents),
        samp AS (
          SELECT doc_id, g, m, w, h, j, i,
                 (i * w) // 9 AS x, (j * h) // 8 AS y
          FROM geom, UNNEST(range(8)) AS tj(j), UNNEST(range(9)) AS ti(i)),
        gray AS (
          SELECT doc_id, j, i, (r*299 + gg*587 + b*114) // 1000 AS gv
          FROM (
            SELECT doc_id, j, i,
                   CASE WHEN pert THEN (((3*g + 5*x + 7*y)*(x + y + 1) + g) % 256 + 128) % 256
                        ELSE ((3*g + 5*x + 7*y)*(x + y + 1) + g) % 256 END AS r,
                   CASE WHEN pert THEN (((11*g + 3*x + 5*y)*(x + 2*y + 1) + 2*g) % 256 + 128) % 256
                        ELSE ((11*g + 3*x + 5*y)*(x + 2*y + 1) + 2*g) % 256 END AS gg,
                   CASE WHEN pert THEN (((7*g + 2*x + 3*y)*(2*x + y + 1) + 3*g) % 256 + 128) % 256
                        ELSE ((7*g + 2*x + 3*y)*(2*x + y + 1) + 3*g) % 256 END AS b
            FROM (SELECT *, m > 0 AND x = (m*3) % w AND y = (m*2) % h AS pert
                  FROM samp))),
        bits AS (
          SELECT a.doc_id, (a.j * 8 + a.i) // 16 AS chunk,
                 CASE WHEN b.gv > a.gv
                      THEN CAST(1 AS BIGINT) << CAST((a.j*8 + a.i) % 16 AS INT)
                      ELSE CAST(0 AS BIGINT) END AS wgt
          FROM gray a JOIN gray b
            ON a.doc_id = b.doc_id AND a.j = b.j AND b.i = a.i + 1
          WHERE a.i < 8),
        hashes AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN chunk = 0 THEN wgt ELSE 0 END) AS BIGINT) AS c0,
                 CAST(SUM(CASE WHEN chunk = 1 THEN wgt ELSE 0 END) AS BIGINT) AS c1,
                 CAST(SUM(CASE WHEN chunk = 2 THEN wgt ELSE 0 END) AS BIGINT) AS c2,
                 CAST(SUM(CASE WHEN chunk = 3 THEN wgt ELSE 0 END) AS BIGINT) AS c3
          FROM bits GROUP BY doc_id)
        SELECT id_a, id_b, hamming FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1))
                    + bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3))
                    AS BIGINT) AS hamming
          FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id)
        WHERE hamming <= 3"""),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val sigs = graft.operators.Multimodal.dHashImages(
          graft.operators.Multimodal.synthesizeNearDupImages(
            graft.operators.Fanout.forKernel(docs), "doc_id"), "doc_id")
        graft.operators.Dedup.hammingPairs(sigs, "doc_id", "dhash",
            maxHamming = 3)
          .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
      }),

    // ---- q155: image dedup END TO END — q152's Hamming-ball pairs fed
    // through the standard keeper election (min-id partner, the Dedup
    // output convention), so a crawl can `filter(!is_duplicate)` its
    // image corpus exactly as it does text. Same banded candidates,
    // never all-pairs; the oracle brute-forces pairs then replays the
    // q92 keeper select. ----
    QuerySpec(
      "q155_image_dedup_keeper",
      Some("""
        WITH geom AS (
          SELECT doc_id, doc_id // 5 AS g, CAST(doc_id % 5 AS INT) AS m,
                 CAST(8 + (doc_id // 5) % 3 AS INT) AS w,
                 CAST(8 + (doc_id // 5) % 2 AS INT) AS h
          FROM documents),
        samp AS (
          SELECT doc_id, g, m, w, h, j, i,
                 (i * w) // 9 AS x, (j * h) // 8 AS y
          FROM geom, UNNEST(range(8)) AS tj(j), UNNEST(range(9)) AS ti(i)),
        gray AS (
          SELECT doc_id, j, i, (r*299 + gg*587 + b*114) // 1000 AS gv
          FROM (
            SELECT doc_id, j, i,
                   CASE WHEN pert THEN (((3*g + 5*x + 7*y)*(x + y + 1) + g) % 256 + 128) % 256
                        ELSE ((3*g + 5*x + 7*y)*(x + y + 1) + g) % 256 END AS r,
                   CASE WHEN pert THEN (((11*g + 3*x + 5*y)*(x + 2*y + 1) + 2*g) % 256 + 128) % 256
                        ELSE ((11*g + 3*x + 5*y)*(x + 2*y + 1) + 2*g) % 256 END AS gg,
                   CASE WHEN pert THEN (((7*g + 2*x + 3*y)*(2*x + y + 1) + 3*g) % 256 + 128) % 256
                        ELSE ((7*g + 2*x + 3*y)*(2*x + y + 1) + 3*g) % 256 END AS b
            FROM (SELECT *, m > 0 AND x = (m*3) % w AND y = (m*2) % h AS pert
                  FROM samp))),
        bits AS (
          SELECT a.doc_id, (a.j * 8 + a.i) // 16 AS chunk,
                 CASE WHEN b.gv > a.gv
                      THEN CAST(1 AS BIGINT) << CAST((a.j*8 + a.i) % 16 AS INT)
                      ELSE CAST(0 AS BIGINT) END AS wgt
          FROM gray a JOIN gray b
            ON a.doc_id = b.doc_id AND a.j = b.j AND b.i = a.i + 1
          WHERE a.i < 8),
        hashes AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN chunk = 0 THEN wgt ELSE 0 END) AS BIGINT) AS c0,
                 CAST(SUM(CASE WHEN chunk = 1 THEN wgt ELSE 0 END) AS BIGINT) AS c1,
                 CAST(SUM(CASE WHEN chunk = 2 THEN wgt ELSE 0 END) AS BIGINT) AS c2,
                 CAST(SUM(CASE WHEN chunk = 3 THEN wgt ELSE 0 END) AS BIGINT) AS c3
          FROM bits GROUP BY doc_id),
        verified AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1))
              + bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3)) <= 3),
        best AS (
          SELECT id_b AS doc_id, MIN(id_a) AS partner_min FROM verified GROUP BY 1)
        SELECT d.doc_id,
               LEAST(COALESCE(partner_min, d.doc_id), d.doc_id) AS keep_id,
               LEAST(COALESCE(partner_min, d.doc_id), d.doc_id) <> d.doc_id AS is_duplicate
        FROM documents d LEFT JOIN best USING (doc_id)"""),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val sigs = graft.operators.Multimodal.dHashImages(
          graft.operators.Multimodal.synthesizeNearDupImages(
            graft.operators.Fanout.forKernel(docs), "doc_id"), "doc_id")
        val pairs = graft.operators.Dedup.hammingPairs(sigs, "doc_id", "dhash",
          maxHamming = 3).select("id_a", "id_b")
        graft.operators.Dedup.keeperFrom(docs, "doc_id", pairs)
      }),

    // ---- q159: AUDIO perceptual near-dup — the modality triplet's
    // third leg (text: MinHash/SimHash; images: q152 dHash; audio:
    // this). Each doc synthesizes a genuine RIFF/WAVE PCM16 payload
    // from the closed-form near-dup fixture (groups of 5 share a base
    // signal, members nudge one sample per frame); the engine runs the
    // real parse → sample decode → spectral hash loop: 9 frames × 64
    // samples correlated against the 8 Walsh square-wave bands
    // ((−1)^popcount(b&t) — an integer filterbank, so the oracle
    // replays every energy exactly), band-energy deltas over time
    // become the 64-bit hash (chromaprint's construction), and
    // candidates come from the same pigeonhole chunk equi-join as
    // every Hamming family (Dedup.hammingPairs — never all-pairs).
    // The oracle computes the hash bit-for-bit from the sample
    // formula as four 16-bit chunks and brute-forces pairs — the
    // quarantined baseline the banding provably equals. ----
    QuerySpec(
      "q159_audio_dhash_pairs",
      Some("""
        WITH samp AS (
          SELECT doc_id, t, CAST(t // 64 AS INT) AS f,
                 ((3*(doc_id//5) + 2*t) * (t % 7 + 1) + 5*(doc_id//5)*(t % 13)) % 4096 - 2048
                   + CASE WHEN doc_id % 5 > 0 AND t % 64 = doc_id % 5
                          THEN 7 * (doc_id % 5) ELSE 0 END AS s
          FROM documents, UNNEST(range(576)) AS tt(t)),
        energy AS (
          SELECT doc_id, b, f,
                 ABS(SUM(s * CASE WHEN bit_count(b & (t % 64)) % 2 = 0
                                  THEN 1 ELSE -1 END)) AS e
          FROM samp, UNNEST(range(8)) AS bb(b)
          GROUP BY doc_id, b, f),
        bits AS (
          SELECT a.doc_id, (a.b * 8 + a.f) // 16 AS chunk,
                 CASE WHEN n.e > a.e
                      THEN CAST(1 AS BIGINT) << CAST((a.b * 8 + a.f) % 16 AS INT)
                      ELSE CAST(0 AS BIGINT) END AS wgt
          FROM energy a JOIN energy n
            ON n.doc_id = a.doc_id AND n.b = a.b AND n.f = a.f + 1
          WHERE a.f < 8),
        hashes AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN chunk = 0 THEN wgt ELSE 0 END) AS BIGINT) AS c0,
                 CAST(SUM(CASE WHEN chunk = 1 THEN wgt ELSE 0 END) AS BIGINT) AS c1,
                 CAST(SUM(CASE WHEN chunk = 2 THEN wgt ELSE 0 END) AS BIGINT) AS c2,
                 CAST(SUM(CASE WHEN chunk = 3 THEN wgt ELSE 0 END) AS BIGINT) AS c3
          FROM bits GROUP BY doc_id)
        SELECT id_a, id_b, hamming FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1))
                    + bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3))
                    AS BIGINT) AS hamming
          FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id)
        WHERE hamming <= 3"""),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val sigs = graft.operators.Multimodal.audioDHashWavs(
          graft.operators.Multimodal.synthesizeNearDupWavs(
            graft.operators.Fanout.forKernel(docs), "doc_id"), "doc_id")
        graft.operators.Dedup.hammingPairs(sigs, "doc_id", "dhash",
            maxHamming = 3)
          .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
      }),

    // ---- q162: VIDEO perceptual near-dup — the modality QUARTET's
    // fourth leg (text: MinHash/SimHash; images: q152; audio: q159;
    // video: this). Each doc synthesizes a genuine YUV4MPEG2 container
    // (the uncompressed interchange format ffmpeg consumes) from the
    // closed-form near-dup fixture (groups of 5 share a base frame
    // sequence, members bump one pixel's luma in a single frame); the
    // engine runs the real parse → FRAME-marker walk → C444 plane
    // decode loop: 9 frames sampled at nearest-neighbor time indices
    // (dhash64's grid arithmetic applied to time), each reduced to 8
    // vertical-strip luma sums, strip-sum deltas over time become the
    // 64-bit temporal hash (the TIRI construction), and candidates
    // come from the same pigeonhole chunk equi-join as every Hamming
    // family (Dedup.hammingPairs — never all-pairs). The oracle
    // computes the hash bit-for-bit from the luma formula as four
    // 16-bit chunks and brute-forces pairs — the quarantined baseline
    // the banding provably equals. ----
    QuerySpec(
      "q162_video_dhash_pairs",
      Some("""
        WITH geom AS (
          SELECT doc_id, doc_id // 5 AS g, CAST(doc_id % 5 AS INT) AS m,
                 CAST(8 + (doc_id // 5) % 3 AS INT) AS w,
                 CAST(8 + (doc_id // 5) % 2 AS INT) AS h,
                 CAST(10 + (doc_id // 5) % 3 AS INT) AS nf
          FROM documents),
        samp AS (
          SELECT doc_id, g, m, w, h, k, (k * nf) // 9 AS f, x, y
          FROM geom, UNNEST(range(9)) AS tk(k), UNNEST(range(10)) AS tx(x),
               UNNEST(range(9)) AS ty(y)
          WHERE x < w AND y < h),
        luma AS (
          SELECT doc_id, k, (x * 8) // w AS strip,
                 CASE WHEN m > 0 AND f = m
                       AND x = (3*m) % w AND y = (2*m) % h
                      THEN (((3*g + 5*x + 7*y + 2*f)*(x + y + f + 1) + g) % 256 + 128) % 256
                      ELSE ((3*g + 5*x + 7*y + 2*f)*(x + y + f + 1) + g) % 256 END AS yv
          FROM samp),
        sums AS (
          SELECT doc_id, strip, k, SUM(yv) AS s
          FROM luma GROUP BY doc_id, strip, k),
        bits AS (
          SELECT a.doc_id, (a.strip * 8 + a.k) // 16 AS chunk,
                 CASE WHEN n.s > a.s
                      THEN CAST(1 AS BIGINT) << CAST((a.strip * 8 + a.k) % 16 AS INT)
                      ELSE CAST(0 AS BIGINT) END AS wgt
          FROM sums a JOIN sums n
            ON n.doc_id = a.doc_id AND n.strip = a.strip AND n.k = a.k + 1
          WHERE a.k < 8),
        hashes AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN chunk = 0 THEN wgt ELSE 0 END) AS BIGINT) AS c0,
                 CAST(SUM(CASE WHEN chunk = 1 THEN wgt ELSE 0 END) AS BIGINT) AS c1,
                 CAST(SUM(CASE WHEN chunk = 2 THEN wgt ELSE 0 END) AS BIGINT) AS c2,
                 CAST(SUM(CASE WHEN chunk = 3 THEN wgt ELSE 0 END) AS BIGINT) AS c3
          FROM bits GROUP BY doc_id)
        SELECT id_a, id_b, hamming FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1))
                    + bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3))
                    AS BIGINT) AS hamming
          FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id)
        WHERE hamming <= 3"""),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val sigs = graft.operators.Multimodal.videoDHashY4m(
          graft.operators.Multimodal.synthesizeNearDupY4m(
            graft.operators.Fanout.forKernel(docs), "doc_id"), "doc_id")
        graft.operators.Dedup.hammingPairs(sigs, "doc_id", "dhash",
            maxHamming = 3)
          .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
      })
  )
}
