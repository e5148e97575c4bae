package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("edit-distance-1 pairs == brute force over every edit class") {
    // substitutions, inserts, deletes, exact dups, distance-2 decoys,
    // empty and single-char edges
    val rows = Seq(
      (1L, "kitten"), (2L, "mitten"),   // substitution
      (3L, "kitte"),                    // delete
      (4L, "kittens"),                  // insert
      (5L, "kitten"),                   // exact dup of 1
      (6L, "sitten"),                   // substitution of 1, dist 2 from 2
      (7L, "smitten"),                  // insert on 2
      (8L, "bolt"), (9L, "boat"),       // substitution
      (10L, "completely different"),
      (11L, ""), (12L, "a"), (13L, "b") // empty/single-char edges
    ).toDF("id", "s")
    val got = FuzzyJoin.editDistance1SelfPairs(rows, "id", "s")
      .as[(Long, Long, Int)].collect().toSet
    val vals = rows.as[(Long, String)].collect()
    val expected = (for {
      (ia, sa) <- vals; (ib, sb) <- vals if ia < ib
      d = brute(sa, sb) if d <= 1
    } yield (ia, ib, d)).toSet
    assert(got == expected, s"got=$got expected=$expected")
    // sanity on the fixture itself: every edit class is present
    assert(expected.contains((1L, 2L, 1)) && expected.contains((1L, 3L, 1)) &&
      expected.contains((1L, 4L, 1)) && expected.contains((1L, 5L, 0)) &&
      expected.contains((2L, 7L, 1)) && expected.contains((11L, 12L, 1)) &&
      expected.contains((12L, 13L, 1)))
    assert(!expected.contains((2L, 6L, 2)), "distance-2 decoy must be out")
  }

  test("identical-string hot group: exact output, candidate join at distinct-string grain") {
    // 200 ids share ONE string (the empty/boilerplate-doc collapse the
    // advisor flagged): the variant self-join must see it ONCE — the
    // r6 shape exploded (len+1) variants per copy and joined G^2 rows
    // per variant key. Output is inherently quadratic (all pairs ARE
    // distance 0) but the work beyond those rows must not be.
    val hot = (1L to 200L).map(i => (i, "same boilerplate prefix here"))
    val rows = (hot ++ Seq((900L, "same boilerplate prefix hers"), // dist 1
      (901L, "unrelated"))).toDF("id", "s")
    val got = FuzzyJoin.editDistance1SelfPairs(rows, "id", "s")
      .as[(Long, Long, Int)].collect().toSet
    val withinExpected = (for {
      a <- 1L to 200L; b <- (a + 1) to 200L
    } yield (a, b, 0)).toSet
    val crossExpected = (1L to 200L).map(a => (a, 900L, 1)).toSet
    assert(got == withinExpected ++ crossExpected)
    // the plan's variant join must be fed by DISTINCT strings: the
    // deduplicating aggregate sits below the variant explode+join
    val p = FuzzyJoin.editDistance1SelfPairs(rows, "id", "s")
      .queryExecution.optimizedPlan
    val aggs = p.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }
    assert(aggs.nonEmpty, "distinct-string pre-aggregation missing from the plan")
  }

  private def brute(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
