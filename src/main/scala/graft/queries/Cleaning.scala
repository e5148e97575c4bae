package graft.queries

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._

/** Cleaning-transform catalog — the reference's data-cleaning operator
  * surface (SURVEY.md §2.2/§2.3) exercised on the synthetic tables.
  *
  *   - LIKE-pattern conditional null-out (P5/F2/F4;
  *     `BatchProcessingFinal.ipynb:1006-1017`) — q20
  *   - regexp_replace prefix-strip + whitespace collapse (F1;
  *     `BatchProcessingFinal.ipynb:1135-1147`) — q21
  *   - k/M suffix expansion + null-on-bad-cast (F1+F8, the
  *     `follower_count` semantics incl. the "25.5k" → null edge,
  *     SURVEY §7.4) — q22
  *   - concat user_name (F5; `BatchProcessingFinal.ipynb:1486`) — q23
  *   - empty→null sweep, the *intent* of the reference's buggy loop
  *     (P8; `Cleaning data and Queries.ipynb:3218-3219`) — q24
  *   - rlike regex filter (P6/F3) — q25
  *   - JSON payload decode, batch twin of the stream's from_json
  *     (F10/S4; `Kinesis_Processing.ipynb:701-712`) — q26
  */
object Cleaning {

  val specs: Seq[QuerySpec] = Seq(

    // ---- q20: LIKE-pattern garbage null-out ----
    // The oracle keeps COUNT(*) OVER () — semantically a grand total on
    // every row — but the Spark plan must NOT: an unpartitioned window
    // moves the whole table into ONE partition (the "WindowExec: No
    // Partition Defined" warning), a single-reducer stage at 100 TB.
    // Instead the total is a 1-row partial+final aggregate broadcast
    // back via cross join: the document scan stays fully parallel and
    // the only exchange is the 1-row broadcast.
    QuerySpec(
      "q20_like_nullout",
      Some("""
        SELECT doc_id,
               CASE WHEN text LIKE 'the %' THEN NULL ELSE text END AS cleaned_text,
               COUNT(*) OVER () AS total
        FROM documents"""),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val total = docs.groupBy().agg(count(lit(1)).as("total"))
        docs
          .select(
            col("doc_id"),
            when(col("text").like("the %"), lit(null)).otherwise(col("text"))
              .as("cleaned_text"))
          .crossJoin(broadcast(total))
      }),

    // ---- q21: regexp_replace prefix strip + whitespace collapse ----
    QuerySpec(
      "q21_regex_clean",
      Some("""
        SELECT doc_id,
               REGEXP_REPLACE(source, '^src', 'source_') AS source_norm,
               REGEXP_REPLACE(TRIM(text), '\s+', ' ', 'g') AS text_norm
        FROM documents"""),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(
            col("doc_id"),
            regexp_replace(col("source"), "^src", "source_").as("source_norm"),
            regexp_replace(trim(col("text")), "\\s+", " ").as("text_norm"))),

    // ---- q22: follower_count k/M expansion + null-on-bad-cast parity.
    // Builds a suffixed string column from n_chars, then applies the
    // reference's exact string surgery: [kK]→"000", [mM]→"000000",
    // then int cast where unparseable → NULL (e.g. any '.5k' form). ----
    QuerySpec(
      "q22_count_suffix_expansion",
      Some("""
        WITH raw AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 4 = 0 THEN CAST(n_chars AS VARCHAR) || 'k'
                      WHEN doc_id % 4 = 1 THEN CAST(n_chars AS VARCHAR) || 'M'
                      WHEN doc_id % 4 = 2 THEN CAST(CAST(n_chars AS DOUBLE)/10 AS VARCHAR) || 'k'
                      ELSE CAST(n_chars AS VARCHAR) END AS raw_count
          FROM documents
        ), expanded_str AS (
          SELECT doc_id, raw_count,
                 REGEXP_REPLACE(REGEXP_REPLACE(raw_count, '[kK]', '000', 'g'),
                                '[mM]', '000000', 'g') AS es
          FROM raw
        )
        SELECT doc_id, raw_count,
               -- reference semantics (= Spark cast): non-integer strings → NULL.
               -- DuckDB's own TRY_CAST would round '51.5000' to 52, so guard.
               CASE WHEN regexp_matches(trim(es), '^[+-]?[0-9]+$')
                    THEN TRY_CAST(trim(es) AS INTEGER) ELSE NULL END AS expanded
        FROM expanded_str"""),
      (s, dir) => {
        val raw = Tables.load(s, dir, "documents")
          .select(
            col("doc_id"),
            when(col("doc_id") % 4 === 0, concat(col("n_chars").cast("string"), lit("k")))
              .when(col("doc_id") % 4 === 1, concat(col("n_chars").cast("string"), lit("M")))
              .when(col("doc_id") % 4 === 2,
                concat((col("n_chars").cast("double") / 10).cast("string"), lit("k")))
              .otherwise(col("n_chars").cast("string"))
              .as("raw_count"))
        raw.select(
          col("doc_id"), col("raw_count"),
          expr("""TRY_CAST(REGEXP_REPLACE(REGEXP_REPLACE(raw_count, '[kK]', '000'),
                                          '[mM]', '000000') AS INT)""").as("expanded"))
      }),

    // ---- q23: concat name construction ----
    QuerySpec(
      "q23_concat_name",
      Some("""
        SELECT c_custkey, c_name || ' ' || c_mktsegment AS display_name
        FROM customer"""),
      (s, dir) =>
        Tables.load(s, dir, "customer")
          .select(
            col("c_custkey"),
            concat(col("c_name"), lit(" "), col("c_mktsegment")).as("display_name"))),

    // ---- q24: empty→null sweep (keep non-empties — the intended fix) ----
    QuerySpec(
      "q24_empty_to_null",
      Some("""
        SELECT doc_id,
               CASE WHEN TRIM(lang) = '' THEN NULL ELSE lang END AS lang,
               CASE WHEN TRIM(source) = '' THEN NULL ELSE source END AS source
        FROM documents"""),
      (s, dir) => {
        val emptyToNull = (c: String) =>
          when(trim(col(c)) === "", lit(null)).otherwise(col(c)).as(c)
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), emptyToNull("lang"), emptyToNull("source"))
      }),

    // ---- q25: rlike regex filter ----
    QuerySpec(
      "q25_rlike_filter",
      Some("""
        SELECT doc_id, source FROM documents
        WHERE REGEXP_MATCHES(source, 'src[0-9]+')"""),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .filter(col("source").rlike("src[0-9]+"))
          .select("doc_id", "source")),

    // ---- q26: JSON payload decode (batch twin of stream from_json) ----
    QuerySpec(
      "q26_json_decode",
      Some("""
        SELECT event_id, CAST(props->>'k' AS BIGINT) AS k
        FROM events"""),
      (s, dir) =>
        Tables.load(s, dir, "events")
          .select(
            col("event_id"),
            from_json(col("props"),
              org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
              .getField("k").as("k")))
  )
}
