package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy string matching — the entity-resolution primitive (near-equal
  * names, typo'd keys) done with the same candidate-generation
  * discipline as the text dedup stack: a narrow per-row signature
  * explode, an equi-join on short keys, exact verification on the
  * candidates only. Never a cross join.
  *
  * Candidates come from SYMMETRIC DELETES (SymSpell): two strings with
  * Levenshtein distance ≤ 1 always share a member of their deletion
  * neighborhoods {s} ∪ {s minus one char} — a substitution shares the
  * deletion at the edited position, an insert/delete shares the shorter
  * string itself. The neighborhood is length+1 variants per row, so the
  * exploded frame is ~avg_len× the input and the join key (variant
  * string) is near-unique outside true near-matches.
  *
  * For larger distance budgets the same shape generalizes (delete up to
  * k chars, C(n,≤k) variants) but the neighborhood grows
  * combinatorially; the scale path there is PassJoin-style fixed-length
  * chunking (pigeonhole on k+1 chunks), which keeps the per-row explode
  * at O(k²). k=1 — by far the common entity-typo budget — is what this
  * operator ships.
  */
object FuzzyJoin {

  /** All (id_a < id_b) pairs whose `strCol` values are within
    * Levenshtein distance 1, with the exact distance. */
  def editDistance1SelfPairs(
      df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val s = col(strCol)
    // {s} ∪ one-char deletions, via codegen'd built-ins only (guard the
    // empty string: sequence(0, -1) would step backwards, not be empty)
    val variants = when(length(s) === 0, array(s)).otherwise(concat(
      array(s),
      transform(sequence(lit(0), length(s) - 1),
        i => concat(s.substr(lit(1), i), s.substr(i + lit(2), length(s))))))
    val exploded = Fanout.forKernel(df)
      .select(col(idCol), s.as("_s"), explode(variants).as("_v"))
    val cand = exploded.select(col("_v"), col(idCol).as("id_a"), col("_s").as("s_a"))
      .join(exploded.select(col("_v"), col(idCol).as("id_b"), col("_s").as("s_b")),
        Seq("_v"))
      .filter(col("id_a") < col("id_b"))
      // a pair can share several variants — dedup BEFORE the DP verify
      .select(col("id_a"), col("id_b"), col("s_a"), col("s_b"))
      .distinct()
    cand
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b")).as("dist"))
      .filter(col("dist") <= 1)
  }
}
