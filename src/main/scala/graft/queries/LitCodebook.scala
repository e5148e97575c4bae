package graft.queries

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Driver-held literal codebooks for the ANN / IVF / PQ catalog family
  * (r20 optimization round; guide §2.4 "remove shuffles outright").
  *
  * Every coarse/product codebook in the catalog is a FIXED, tiny set of
  * centroids (8–16 vectors, by construction of the queries and of the
  * index families they model — FAISS trains and serves codebooks from
  * memory) at any corpus size. Holding the codebook driver-side and
  * folding the argmin/argmax into a per-row projection removes, per
  * assignment pass, one corpus×|codebook| candidate explode (broadcast
  * join or crossJoin), one corpus-grain exchange and two sorts (the
  * row_number argmin window).
  *
  * r21 revision: the r20 projection built an array of (key, id) STRUCTS
  * per row and took `array_min` — K struct allocations plus K−1
  * interpreted struct comparisons per row. At sf0.1 the removed
  * exchanges hid that; the r21 sf1 family run measured it 1.3–1.9×
  * SLOWER than the r19 broadcast-join+window on the assignment-dominated
  * queries (q90/q166/q172/q210) — per-row cost scales with the corpus,
  * fixed job savings don't (guide §1.2). The selection now runs through
  * [[graft.functions.CodebookArgmin]]: ONE fused codegen'd loop over a
  * reference-held long[][] per row (the FAISS assignment kernel shape),
  * returning the winning candidate INDEX. Candidates are pre-sorted by
  * ascending id and the kernel keeps the FIRST minimal key (strict <),
  * so the selection is still exactly the window form's
  * (key ASC, id ASC) top-1, bit for bit.
  *
  * Scale note: this moves NO corpus data to the driver — only the
  * codebook (≤ 16×64 longs) crosses, the same rows the previous form
  * shipped into a broadcast. The assignment stage itself becomes
  * embarrassingly parallel.
  */
private[queries] object LitCodebook {

  /** Bounded collect of an (id, vec) codebook, sorted by id. Callers
    * pass an already-limited frame (8–16 rows). */
  def collect(df: DataFrame, idCol: String, vecCol: String): Seq[(Long, Seq[Long])] =
    df.select(col(idCol).cast("long"), col(vecCol)).collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).sortBy(_._1)

  /** A literal BIGINT array column. */
  def lit64(v: Seq[Long]): Column = expr(v.mkString("array(", "L,", "L)"))

  private def sortedById(cands: Seq[(Long, Seq[Long])]): Seq[(Long, Seq[Long])] =
    cands.sortBy(_._1)

  /** 0-based winning-candidate index from the fused
    * [[graft.functions.CodebookArgmin]] kernel. */
  private def argIdx(vCol: Column, cs: Seq[(Long, Seq[Long])], l2: Boolean): Column = {
    import org.apache.spark.sql.graft.shim
    shim.column(graft.functions.CodebookArgmin(
      shim.expression(vCol), cs.map(_._2.toArray).toArray, l2))
  }

  /** argmax of dot(vCol, cand) with min-id tiebreak — the coarse-
    * quantizer selection. Returns a struct whose `id` field is the
    * winning centroid id (no other field is consumed at corpus grain;
    * `.getField("id")` simplifies to the bare expression). */
  def argmaxDot(vCol: Column, cands: Seq[(Long, Seq[Long])]): Column = {
    val cs = sortedById(cands)
    struct(element_at(lit64(cs.map(_._1)),
      argIdx(vCol, cs, l2 = false) + lit(1)).as("id"))
  }

  /** [[argmaxDot]] carrying the winning centroid itself as a `centv`
    * field — for residual computation. Both fields derive from the one
    * kernel index; the centv lookup is an element_at over a constant
    * array of the codebook's rows. */
  def argmaxDotCentv(vCol: Column, cands: Seq[(Long, Seq[Long])]): Column = {
    val cs = sortedById(cands)
    val idx = argIdx(vCol, cs, l2 = false)
    struct(
      element_at(lit64(cs.map(_._1)), idx + lit(1)).as("id"),
      element_at(
        array(cs.map { case (_, cv) => lit64(cv) }: _*), idx + lit(1)).as("centv"))
  }

  /** Driver-side twin of [[argmaxDot]] — identical Long arithmetic and
    * (dot DESC, id ASC) selection, for deriving bounded codebooks from
    * already-collected rows without another job. */
  def argmaxDotLocal(v: Seq[Long], cands: Seq[(Long, Seq[Long])]): (Long, Seq[Long]) =
    cands.map { case (id, cv) =>
      val d = cv.zip(v).foldLeft(0L) { case (acc, (a, b)) => acc + a * b }
      ((-d, id), (id, cv))
    }.minBy(_._1)._2

  /** argmin of integer L2 with min-id tiebreak — the PQ sub-quantizer
    * selection; fused-kernel index, id via constant lookup. */
  def argminL2(vCol: Column, cands: Seq[(Long, Seq[Long])]): Column = {
    val cs = sortedById(cands)
    struct(element_at(lit64(cs.map(_._1)),
      argIdx(vCol, cs, l2 = true) + lit(1)).as("id"))
  }

  /** Top-k candidates by (dot DESC, id ASC), selected INSIDE the row:
    * sort the literal candidate structs, slice k — the nprobe
    * selection. Explode the result; fields: `nd` (negated dot), `id`.
    * Struct form is fine HERE: this runs on the bounded query frame
    * (tens of rows), never the corpus. */
  def topKDot(vCol: Column, cands: Seq[(Long, Seq[Long])], k: Int): Column =
    slice(array_sort(array(cands.map { case (id, cv) =>
      struct((-VectorFunctions.longDot(vCol, lit64(cv))).as("nd"),
        lit(id).as("id"))
    }: _*)), 1, k)

  /** Slice a full-vector codebook into per-subspace codebooks
    * (m subspaces of `dims` each) — the PQ layout. */
  def subCodebooks(rows: Seq[(Long, Seq[Long])], m: Int, dims: Int)
      : Map[Int, Seq[(Long, Seq[Long])]] =
    (0 until m).map(mi => mi -> rows.map { case (id, v) =>
      id -> v.slice(mi * dims, (mi + 1) * dims) }).toMap

  /** CASE over the subspace column: one expression per m. */
  def perSubspace(mCol: Column, exprs: Seq[(Int, Column)]): Column =
    exprs.tail.foldLeft(when(mCol === exprs.head._1, exprs.head._2)) {
      case (acc, (m, e)) => acc.when(mCol === m, e)
    }
}
