package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>`/`array<double>` columns,
  * composed from Spark's higher-order array functions (zip_with /
  * aggregate) so the math runs inside Catalyst per row with no UDF
  * serialization. Accumulation is a per-row sequential fold — bit-for-bit
  * deterministic across partitionings, which matters for reproducible
  * dedup/ANN results at scale.
  */
object VectorFunctions {

  /** Dot product of two numeric arrays, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; zero-norm inputs → 0.0 (not NaN) so thresholds
    * behave on degenerate vectors. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Deterministic pseudo-random hyperplane signature for LSH bucketing:
    * `planes` sign bits, bit p = sign of Σ_d w(p,d)·v[d] where the weight
    * w(p,d) = ±1 derived from xxhash64(p, d). Seeded by position, not by
    * RNG state, so every executor computes identical planes — no
    * broadcast of plane matrices needed at any scale. Returns a long
    * bitmask column (planes ≤ 63). */
  def hyperplaneSignature(vec: Column, planes: Int): Column = {
    require(planes > 0 && planes <= 63, "planes must be in [1,63]")
    val bits = (0 until planes).map { p =>
      // per-dimension ±1 weights: xxhash64(p, d) parity
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, d) =>
          x.cast("double") *
            when(pmod(xxhash64(lit(p), d), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Hamming distance between two long bitmasks (e.g. simhash values or
    * hyperplane signatures). */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
