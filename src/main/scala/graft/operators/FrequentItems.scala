package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy hitters as a typed [[Aggregator]] — frequent-item
  * counts with BOUNDED state, so the token grain never shuffles: each
  * partition reduces its stream to a ≤ `k`-entry summary map-side
  * (ObjectHashAggregate partial), and only those summaries merge across
  * the exchange. The classic alternative — groupBy(token).count + top-N
  * — shuffles one row per distinct token; at 100 TB vocabularies that
  * is the whole corpus's token table on the wire for an answer that
  * only needs the head of the distribution.
  *
  * Guarantees (standard MG, preserved by the summary merge): every item
  * with true frequency > n/(k+1) appears in the output, and every
  * reported count under-estimates the true count by at most n/(k+1),
  * where n is the stream length. When the DISTINCT item count never
  * exceeds `k` anywhere in the reduce/merge tree, no decrements happen
  * and the counts are EXACT — the regime the q129 oracle twin pins
  * (catalog capacity ≫ corpus vocabulary), while the approximate
  * regime's guarantee is asserted in FrequentItemsSpec with tiny k.
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1)

  def zero: Map[String, Long] = Map.empty

  def reduce(m: Map[String, Long], w: String): Map[String, Long] =
    if (m.contains(w)) m.updated(w, m(w) + 1L)
    else if (m.size < k) m.updated(w, 1L)
    else m.collect { case (t, c) if c > 1L => t -> (c - 1L) }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val s = (a.keySet ++ b.keySet).iterator
      .map(w => w -> (a.getOrElse(w, 0L) + b.getOrElse(w, 0L))).toMap
    if (s.size <= k) s
    else {
      // subtract the (k+1)-th largest count from everything — the merge
      // analogue of MG's decrement; error stays additive in n/(k+1)
      val cut = s.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      s.collect { case (w, c) if c > cut => w -> (c - cut) }
    }
  }

  def finish(m: Map[String, Long]): Map[String, Long] = m

  def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
