package graft

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks._

/** Cross-engine agreement for the [[Exact]] helpers.
  *
  * DuckDB can't run inside the JVM test suite, so the SQL mirrors are
  * checked against a Scala evaluation with DuckDB's arithmetic
  * semantics: DuckDB `%` follows the dividend's sign — exactly Java's
  * `%` on Long — and its other int64 ops match two's-complement Java.
  * The driver's DuckDB gate then covers the non-negative id range end
  * to end (q48/q54/q83/q84 use hashOrderSql).
  */
class ExactSpec extends SparkSpec {

  /** hashOrderSql's formula evaluated with DuckDB `%` semantics. */
  private def sqlMirror(id: Long, buckets: Int): Long =
    ((((id % 1000000007L) + 1000000007L) % 1000000007L) * 2654435761L) % buckets

  test("hashOrder == hashOrderSql semantics for negative and positive ids") {
    import spark.implicits._
    val ids = Seq(Long.MinValue, Long.MinValue + 1, -3400000000L, -1000000007L,
      -1000000006L, -97L, -1L, 0L, 1L, 97L, 1000000006L, 1000000007L,
      3400000000L, Long.MaxValue - 1, Long.MaxValue) ++
      (1 to 200).map(i => i * 2654435761L % 999999937L - 500000000L)
    forAll(Table("buckets", 2, 97, 100, 10000, 1000000)) { buckets =>
      val df = ids.toDF("id")
      val sparkSide = df.select(col("id"), Exact.hashOrder(col("id"), buckets).as("h"))
        .as[(Long, Long)].collect().toMap
      ids.foreach { id =>
        assert(sparkSide(id) == sqlMirror(id, buckets),
          s"id=$id buckets=$buckets spark=${sparkSide(id)} sqlMirror=${sqlMirror(id, buckets)}")
        assert(sparkSide(id) >= 0, s"hashOrder must be non-negative, id=$id")
      }
    }
  }

  test("cents == centsSql semantics on exact and computed doubles") {
    import spark.implicits._
    val xs = Seq(0.0, 0.005, 1.0, 1.005, 2.675, 19.99, 1234.565, -1.005, -19.99,
      901.00499999999994, 3.3000000000000003)
    val df = xs.toDF("x")
    val sparkSide = df.select(col("x"), Exact.cents(col("x")).as("c"))
      .as[(Double, Long)].collect().toMap
    xs.foreach { x =>
      val mirror = math.floor(x * 100 + 0.5).toLong
      assert(sparkSide(x) == mirror, s"x=$x spark=${sparkSide(x)} mirror=$mirror")
    }
  }
}
