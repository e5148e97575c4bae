package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * Skew discipline: candidate generation runs over DISTINCT strings
  * only. A popular identical string (empty docs, boilerplate) would
  * otherwise hit the variant self-join as a hot key with G² × (len+1)
  * amplification; deduplicating first caps the join at distinct-string
  * grain, and the id-level expansion happens AFTER verification —
  * within-group pairs are emitted directly (each output row costs one
  * joined row, no explode amplification), cross-group pairs expand the
  * two matched string groups. The output itself is inherently quadratic
  * in group size (all id pairs of an identical group ARE within
  * distance 0); the point is the WORK no longer is, beyond the rows
  * actually returned.
  *
  * For larger distance budgets the same shape generalizes (delete up to
  * k chars, C(n,≤k) variants) but the neighborhood grows
  * combinatorially; the scale path there is PassJoin-style fixed-length
  * chunking (pigeonhole on k+1 chunks), which keeps the per-row explode
  * at O(k²). k=1 — by far the common entity-typo budget — is what this
  * operator ships.
  */
object FuzzyJoin {

  /** {s} ∪ one-char deletions, via codegen'd built-ins only (guard the
    * empty string: sequence(0, -1) would step backwards, not be empty) */
  private def deleteNeighborhood(s: Column): Column =
    when(length(s) === 0, array(s)).otherwise(concat(
      array(s),
      transform(sequence(lit(0), length(s) - 1),
        i => concat(s.substr(lit(1), i), s.substr(i + lit(2), length(s))))))

  /** All (id_a < id_b) pairs whose `strCol` values are within
    * Levenshtein distance 1, with the exact distance. */
  def editDistance1SelfPairs(
      df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val tagged = df.select(col(idCol), col(strCol).as("_s"))
    // candidate generation at distinct-string grain
    val uniq = Fanout.forKernel(tagged.select(col("_s")).distinct())
    val exploded = uniq
      .select(col("_s"), explode(deleteNeighborhood(col("_s"))).as("_v"))
    val strPairs = exploded.select(col("_v"), col("_s").as("s_a"))
      .join(exploded.select(col("_v"), col("_s").as("s_b")), Seq("_v"))
      .filter(col("s_a") < col("s_b"))
      // a pair can share several variants — dedup BEFORE the DP verify
      .select(col("s_a"), col("s_b")).distinct()
      .select(col("s_a"), col("s_b"),
        levenshtein(col("s_a"), col("s_b")).as("dist"))
      .filter(col("dist") <= 1)
    // expansion back to ids: cross-group pairs (distinct matched
    // strings) + within-group pairs (identical strings, distance 0)
    val cross = strPairs
      .join(tagged.select(col("_s").as("s_a"), col(idCol).as("_ia")), Seq("s_a"))
      .join(tagged.select(col("_s").as("s_b"), col(idCol).as("_ib")), Seq("s_b"))
      .select(least(col("_ia"), col("_ib")).as("id_a"),
        greatest(col("_ia"), col("_ib")).as("id_b"), col("dist"))
    val within = tagged.select(col("_s"), col(idCol).as("_ia"))
      .join(tagged.select(col("_s"), col(idCol).as("_ib")), Seq("_s"))
      .filter(col("_ia") < col("_ib"))
      .select(col("_ia").as("id_a"), col("_ib").as("id_b"),
        lit(0).as("dist"))
    cross.unionByName(within)
  }
}
