package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a partial-aggregatable Spark `Aggregator`.
  *
  * Why this exists: computing "top k per query" with a window function
  * shuffles EVERY scored row (the rank's hash partitioning is never
  * satisfied by the scan partitioning), so |corpus|×|queries| rows cross
  * the wire. As an Aggregator, Spark runs map-side partial aggregation:
  * each input partition reduces to ≤ k entries per group before the
  * exchange, so the shuffle carries at most k × partitions × |groups|
  * rows — the difference between feasible and not at 100 TB.
  *
  * Scores ties break on ascending id, matching the deterministic window
  * ordering `(score desc, id asc)` — tests assert the two forms agree.
  */
object TopKAggregator {

  /** One scored candidate. */
  case class Scored(score: Double, id: Long)

  /** Aggregation buffer: up to k candidates, kept sorted
    * (score desc, id asc) so merge/trim is a linear merge. */
  case class Buf(k: Int, items: List[Scored])

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def mergeSorted(k: Int, a: List[Scored], b: List[Scored]): List[Scored] = {
    val out = List.newBuilder[Scored]
    var n = 0
    var x = a; var y = b
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && better(x.head, y.head))) {
        out += x.head; x = x.tail
      } else {
        out += y.head; y = y.tail
      }
      n += 1
    }
    out.result()
  }

  class TopK(k: Int) extends Aggregator[Scored, Buf, Seq[Scored]] {
    override def zero: Buf = Buf(k, Nil)
    override def reduce(b: Buf, a: Scored): Buf =
      Buf(k, mergeSorted(k, b.items, a :: Nil))
    override def merge(b1: Buf, b2: Buf): Buf =
      Buf(k, mergeSorted(k, b1.items, b2.items))
    override def finish(r: Buf): Seq[Scored] = r.items
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Column-level entry: `topK(k)(scoreCol, idCol)` →
    * `array<struct<score double, id bigint>>` sorted (score desc, id). */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopK(k), Encoders.product[Scored])
    (score: Column, id: Column) => fn(score, id)
  }

  /** A scored candidate carrying an INERT payload: ordering and ties
    * are (score desc, id asc) exactly as [[Scored]] — the payload never
    * participates, it just rides along so a caller can keep one extra
    * long per kept row without packing it into the id (packing caps the
    * id domain at 2^63/packBase and silently corrupts negative or
    * hash-range ids — the r15 `prepare()` fix). */
  case class ScoredP(score: Double, id: Long, payload: Long)

  case class BufP(k: Int, items: List[ScoredP])

  private def betterP(a: ScoredP, b: ScoredP): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def mergeSortedP(
      k: Int, a: List[ScoredP], b: List[ScoredP]): List[ScoredP] = {
    val out = List.newBuilder[ScoredP]
    var n = 0
    var x = a; var y = b
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && betterP(x.head, y.head))) {
        out += x.head; x = x.tail
      } else {
        out += y.head; y = y.tail
      }
      n += 1
    }
    out.result()
  }

  class TopKPair(k: Int) extends Aggregator[ScoredP, BufP, Seq[ScoredP]] {
    override def zero: BufP = BufP(k, Nil)
    override def reduce(b: BufP, a: ScoredP): BufP =
      BufP(k, mergeSortedP(k, b.items, a :: Nil))
    override def merge(b1: BufP, b2: BufP): BufP =
      BufP(k, mergeSortedP(k, b1.items, b2.items))
    override def finish(r: BufP): Seq[ScoredP] = r.items
    override def bufferEncoder: Encoder[BufP] = Encoders.product[BufP]
    override def outputEncoder: Encoder[Seq[ScoredP]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredP]]()
  }

  /** `topKPair(k)(scoreCol, idCol, payloadCol)` →
    * `array<struct<score double, id bigint, payload bigint>>` sorted
    * (score desc, id asc); payload is inert in the ordering. Same
    * map-side-partial shuffle bound as [[topK]] at 24 bytes/entry. */
  def topKPair(k: Int): (Column, Column, Column) => Column = {
    val fn = udaf(new TopKPair(k), Encoders.product[ScoredP])
    (score: Column, id: Column, payload: Column) => fn(score, id, payload)
  }
}
