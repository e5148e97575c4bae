import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the hot-key crossover for the bucketed windowed operators:
  * a synthetic stream where one user owns `hotShare` of all events.
  * Not part of Bench (results are environment-dependent); run manually,
  * numbers recorded in SCALING.md. */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000000)
    val hotSharePct = args.lift(1).map(_.toInt).getOrElse(40)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val hour = 3600000000L
    // deterministic skewed events: hotSharePct% on user 1, rest spread
    val events = spark.range(n.toLong).select(
      when(pmod(col("id"), lit(100)) < hotSharePct, 1L)
        .otherwise(pmod(col("id") * 2654435761L, lit(5000)) + 2L).as("user_id"),
      col("id").as("event_id"),
      (pmod(col("id") * 40503L, lit(20000)) * (hour / 200)).as("us"))
      .persist()
    println(s"events=${events.count()} hotShare=${hotSharePct}%")
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    time("sess plain   ")(graft.operators.Sessionize.sessionize(
      events, "user_id", "event_id", "us", 1800000000L))
    time("sess bucketed")(graft.operators.Sessionize.sessionizeBucketed(
      events, "user_id", "event_id", "us", 1800000000L, hour))

    val left = events.select(col("user_id"), col("event_id"), col("us"))
    val right = events.filter(col("event_id") % 20 === 0)
      .groupBy(col("user_id"), col("us"))
      .agg(max(col("event_id")).as("ref_id"))
      .persist()
    right.count()
    time("asof plain   ")(graft.operators.AsofJoin.asofBackward(
      left, right, "user_id", "us", Seq("ref_id")))
    time("asof bucketed")(graft.operators.AsofJoin.asofBackwardBucketed(
      left, right, "user_id", "us", Seq("ref_id"), hour))
    spark.stop()
  }
}
