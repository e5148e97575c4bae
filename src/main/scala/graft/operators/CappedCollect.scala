package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Posting-list aggregation with a hard memory bound: per group, the
  * TRUE element count plus the ids themselves, kept only while the
  * group stays under `cap` elements.
  *
  * Why this exists: `collect_list` has no size bound, so a degenerate
  * hot key (a boilerplate shingle present in every document) builds a
  * group-state proportional to the corpus in ONE reducer — the exact
  * failure mode df caps exist to prevent, moved one stage earlier. This
  * aggregator keeps at most `cap` ids per group no matter how large the
  * group gets (`df` keeps counting, the list stops growing), so a
  * downstream `df <= cap - 1` filter sees a COMPLETE list for every
  * group it keeps and pays O(cap) state for every group it drops.
  * Partial aggregation applies as with any Aggregator: map-side buffers
  * are themselves capped, and merges concatenate up to the cap.
  *
  * Output: `struct<df bigint, ds array<bigint>>` — true count + the
  * (order-unspecified, capped) id list.
  */
object CappedCollect {

  /** Aggregation buffer: true count `n`, capped id list (prepend-only;
    * `nIds` tracks the list length so the cap check is O(1)). */
  case class Buf(cap: Int, n: Long, nIds: Int, ids: List[Long])

  /** Finished value: true group size + capped id list. */
  case class Posting(df: Long, ds: Seq[Long])

  class CollectCapped(cap: Int) extends Aggregator[Long, Buf, Posting] {
    require(cap > 0)
    override def zero: Buf = Buf(cap, 0L, 0, Nil)
    override def reduce(b: Buf, id: Long): Buf =
      if (b.nIds < cap) Buf(cap, b.n + 1, b.nIds + 1, id :: b.ids)
      else b.copy(n = b.n + 1)
    override def merge(b1: Buf, b2: Buf): Buf = {
      val take = math.min(cap - b1.nIds, b2.nIds)
      Buf(cap, b1.n + b2.n, b1.nIds + take,
        if (take == b2.nIds) b2.ids ::: b1.ids
        else b2.ids.take(take) ::: b1.ids)
    }
    override def finish(r: Buf): Posting = Posting(r.n, r.ids)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Posting] = Encoders.product[Posting]
  }

  /** Column-level entry: `collectCapped(cap)(idCol)` →
    * `struct<df bigint, ds array<bigint>>`. */
  def collectCapped(cap: Int): Column => Column = {
    val fn = udaf(new CollectCapped(cap), Encoders.scalaLong)
    (id: Column) => fn(id)
  }
}
