package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RollupSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int, seed: Int) = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)((s"k${r.nextInt(5)}", r.nextInt(3).toLong, r.nextInt(1000).toLong))
      .toDF("k1", "k2", "v")
  }

  test("merge(partial(A), partial(B)) == partial(A union B) for any split") {
    val all = rows(400, 3)
    val keys = Seq("k1", "k2")
    val sums = Seq("v_sum" -> col("v"))
    val full = Rollup.partial(all, keys, sums)
    for (frac <- Seq(0.0, 0.3, 0.97)) {
      val pred = col("v") < lit((frac * 1000).toLong)
      val merged = Rollup.merge(
        Rollup.partial(all.filter(pred), keys, sums),
        Rollup.partial(all.filter(!pred), keys, sums), keys)
      assertSameRows(merged, full, s"split at $frac")
    }
  }

  test("merge folds repeatedly: day-by-day equals one-shot") {
    val keys = Seq("k1", "k2")
    val sums = Seq("v_sum" -> col("v"))
    val days = Seq(rows(100, 1), rows(150, 2), rows(50, 4))
    val oneShot = Rollup.partial(days.reduce(_ unionByName _), keys, sums)
    val folded = days.tail.foldLeft(Rollup.partial(days.head, keys, sums)) {
      (st, d) => Rollup.merge(st, Rollup.partial(d, keys, sums), keys)
    }
    assertSameRows(folded, oneShot, "incremental fold")
  }

  test("mismatched state/delta schemas are rejected") {
    val keys = Seq("k1", "k2")
    val a = Rollup.partial(rows(10, 5), keys, Seq("v_sum" -> col("v")))
    val b = Rollup.partial(rows(10, 6), keys, Seq("other" -> col("v")))
    intercept[IllegalArgumentException](Rollup.merge(a, b, keys))
  }
}
