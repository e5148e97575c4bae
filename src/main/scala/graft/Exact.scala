package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine exact-arithmetic helpers — the single source of truth
  * for the conventions in [[QuerySpec]]'s determinism rules, so a
  * convention change can never half-apply (the round-1 ROUND/FLOOR
  * divergence was exactly a convention with two spellings).
  */
object Exact {

  /** Money/doubles → integer cents: `FLOOR(x*100 + 0.5)` is pure IEEE
    * arithmetic, identical on any engine given the same input double
    * (Spark's ROUND rounds the shortest-decimal BigDecimal, DuckDB the
    * binary value — they disagree by one cent on computed prices). */
  def cents(c: Column): Column = floor(c * 100 + lit(0.5)).cast("long")

  /** DuckDB-side mirror of [[cents]]. */
  def centsSql(e: String): String = s"CAST(FLOOR($e*100 + 0.5) AS BIGINT)"

  /** Deterministic pseudo-random ordering key from an integer id:
    * Knuth multiplicative hash with a pre-mod so the product stays in
    * int64 for ANY id (DuckDB errors on BIGINT overflow; Spark wraps
    * silently — either way the naive `id * 2654435761` breaks past
    * ~3.4e9 ids). */
  def hashOrder(id: Column, buckets: Int): Column =
    pmod(pmod(id, lit(1000000007L)) * 2654435761L, lit(buckets))

  /** DuckDB-side mirror of [[hashOrder]]. DuckDB's `%` follows the
    * dividend's sign while the Spark side uses `pmod`, so the inner mod
    * is wrapped non-negative; the product of a non-negative inner and a
    * positive constant is non-negative, so the outer `%` needs no wrap.
    * (Asserted against pmod semantics for negative ids in ExactSpec.) */
  def hashOrderSql(id: String, buckets: Int): String =
    s"((((($id % 1000000007) + 1000000007) % 1000000007) * 2654435761) % $buckets)"
}
