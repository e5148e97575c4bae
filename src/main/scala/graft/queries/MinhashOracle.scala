package graft.queries

/** Shared DuckDB replay of the md5-family MinHash-LSH pipeline — the
  * q91 oracle construction (shingle md5 → affine signatures with the
  * engine's own inlined coefficients → raw-slice banding → bucket
  * pairs → exact-Jaccard verify), factored out once it grew a third
  * consumer (q91 self-dedup, q199 bipartite decontamination, q201
  * source-overlap matrix). Producing SQL text, not plans: each query
  * appends its own pair/verify/report CTEs. */
private[queries] object MinhashOracle {

  /** WITH-clause body from `coeffs` through `banded` over the
    * `documents` view: per-doc distinct 3-shingle md5 hashes (`sh.hs`),
    * signatures (`sigs.sig`) and banded slices (`banded(doc_id, b,
    * key)`). Callers append further CTEs; the string ends WITHOUT a
    * trailing comma. */
  def signaturesCte(k: Int, bands: Int): String = {
    val rows = k / bands
    val (as, bs) = graft.functions.MinHashSignature.coefficients(k)
    def unsigned(v: Long): java.math.BigInteger =
      if (v >= 0) java.math.BigInteger.valueOf(v)
      else java.math.BigInteger.valueOf(v).add(java.math.BigInteger.ONE.shiftLeft(64))
    val coeffRows = (0 until k).map(j =>
      s"($j, CAST('${unsigned(as(j))}' AS HUGEINT), CAST('${unsigned(bs(j))}' AS HUGEINT))")
      .mkString(",\n          ")
    s"""coeffs(j, a, b) AS (VALUES
          $coeffRows),
        toks AS (
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
          FROM sigs, (SELECT unnest(range(0, $bands)) AS b))"""
  }

  /** The self-join pair + exact-Jaccard verify CTEs over [[signaturesCte]]'s
    * `banded`/`sh` (q91/q201 shape): `verified(id_a, id_b)` with
    * id_a < id_b at the given threshold. Ends without a trailing comma. */
  def verifiedSelfPairsCte(threshold: Double): String =
    s"""pairs AS (
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
                        / CAST(len(list_distinct(s1.hs || s2.hs)) AS DOUBLE) END >= $threshold)"""
}
