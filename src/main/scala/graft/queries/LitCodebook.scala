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
  * row_number argmin window) — while producing the SAME selection bit
  * for bit: candidates are (key, id) structs and `array_min` picks the
  * lexicographic least, i.e. exactly the window form's
  * (key ASC, id ASC) top-1 (argmax keys ride negated). The id is unique
  * across candidates, so later struct fields can never influence the
  * selection.
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

  /** argmax of dot(vCol, cand) with min-id tiebreak — the coarse-
    * quantizer selection. Returns the winning struct: `.getField("id")`
    * is the centroid id, `.getField("nd")` the NEGATED winning dot. */
  def argmaxDot(vCol: Column, cands: Seq[(Long, Seq[Long])]): Column =
    array_min(array(cands.map { case (id, cv) =>
      struct((-VectorFunctions.longDot(vCol, lit64(cv))).as("nd"),
        lit(id).as("id"))
    }: _*))

  /** [[argmaxDot]] carrying the winning centroid itself as a trailing
    * `centv` field (selection is decided by (nd, id) before `centv` is
    * ever compared — id is unique) — for residual computation. */
  def argmaxDotCentv(vCol: Column, cands: Seq[(Long, Seq[Long])]): Column =
    array_min(array(cands.map { case (id, cv) =>
      struct((-VectorFunctions.longDot(vCol, lit64(cv))).as("nd"),
        lit(id).as("id"), lit64(cv).as("centv"))
    }: _*))

  /** Driver-side twin of [[argmaxDot]] — identical Long arithmetic and
    * (dot DESC, id ASC) selection, for deriving bounded codebooks from
    * already-collected rows without another job. */
  def argmaxDotLocal(v: Seq[Long], cands: Seq[(Long, Seq[Long])]): (Long, Seq[Long]) =
    cands.map { case (id, cv) =>
      val d = cv.zip(v).foldLeft(0L) { case (acc, (a, b)) => acc + a * b }
      ((-d, id), (id, cv))
    }.minBy(_._1)._2

  /** Integer L2 distance ||vCol − cv||² against a literal centroid —
    * one fused codegen'd pass ([[VectorFunctions.longL2]]; guide §4).
    * The former zip_with+aggregate form ran INTERPRETED (higher-order
    * functions are CodegenFallback) and allocated a difference array
    * per (row, candidate); the v·v+c·c−2·v·c expansion over two
    * [[VectorFunctions.longDot]] calls measured WORSE (codegen
    * subexpression elimination skips conditional branches, so v·v
    * re-evaluated per candidate). Value-identical by definition. */
  def l2Lit(vCol: Column, cv: Seq[Long]): Column =
    VectorFunctions.longL2(vCol, lit64(cv))

  /** argmin of integer L2 with min-id tiebreak — the PQ sub-quantizer
    * selection. `.getField("id")` is the code, `.getField("dist")` the
    * winning distance. */
  def argminL2(vCol: Column, cands: Seq[(Long, Seq[Long])]): Column =
    array_min(array(cands.map { case (id, cv) =>
      struct(l2Lit(vCol, cv).as("dist"), lit(id).as("id"))
    }: _*))

  /** Interpreted-HOF twin of [[l2Lit]], value-identical. Kept for
    * q167's residual-codes stage ONLY, on measurement: that stage
    * already carries the 16×64-literal coarse argmax and the residual
    * zip_with in one codegen span, and inlining 8 more L2 loops into it
    * measured 1.25× SLOWER back-to-back (4 interleaved windows, r21),
    * while the same fused kernel is 0.84–0.89× on q166/q172/q173.
    * Empirical, not principled — the md records the A/B. */
  def l2LitHof(vCol: Column, cv: Seq[Long]): Column =
    aggregate(
      zip_with(vCol, lit64(cv), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** [[argminL2]] over [[l2LitHof]] — see its caveat. */
  def argminL2Hof(vCol: Column, cands: Seq[(Long, Seq[Long])]): Column =
    array_min(array(cands.map { case (id, cv) =>
      struct(l2LitHof(vCol, cv).as("dist"), lit(id).as("id"))
    }: _*))

  /** Top-k candidates by (dot DESC, id ASC), selected INSIDE the row:
    * sort the literal candidate structs, slice k — the nprobe
    * selection. Explode the result; fields: `nd` (negated dot), `id`. */
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
