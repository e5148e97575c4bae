import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the q52/q53 uniform-key constant factor
  * (VERDICT r3 item 1). Times the plain vs bucketed windowed operators
  * on the real sf0.1 events table, plus decomposed variants, to find
  * where the 8.5x/5.3x goes. Not part of Bench; delete or keep as a
  * manual tool. */
object ProfileBucketed {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${4 * 1024 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String, reps: Int = 5)(df: => DataFrame): Double = {
      // one warm (codegen/JIT), then median of COLD reps: clear the
      // cache before each so a fresh persist inside the operator is
      // rebuilt, exactly as the driver's single-shot bench pays it
      df.write.mode("overwrite").format("noop").save()
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = ts(reps / 2)
      println(f"$label%-28s median ${med}%.3f s  (min ${ts.head}%.3f max ${ts.last}%.3f)")
      med
    }

    def events: DataFrame =
      graft.Tables.load(spark, sfDir, "events")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))

    println(s"events rows=${events.count()}")

    val gap = 1800000000L
    val hour = 3600000000L

    time("q50 sessionize plain")(
      graft.operators.Sessionize.sessionize(events, "user_id", "event_id", "us", gap))
    time("q52 sessionize bucketed")(
      graft.operators.Sessionize.sessionizeBucketed(events, "user_id", "event_id", "us", gap, hour))

    // decomposition: phase-1 partials only (window + groupBy, no persist)
    time("q52 phase1 only (no persist)") {
      val withB = events.select(col("user_id").as("_u"), col("event_id").as("_id"), col("us").as("_us"))
        .withColumn("_b", expr(s"_us DIV $hour"))
      val w1 = org.apache.spark.sql.expressions.Window
        .partitionBy(col("_u"), col("_b")).orderBy(col("_us"), col("_id"))
      val run1 = w1.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      withB
        .withColumn("_new", when(lag(col("_us"), 1).over(w1).isNull ||
          col("_us") - lag(col("_us"), 1).over(w1) > gap, 1).otherwise(0))
        .withColumn("_lseq", sum(col("_new")).over(run1))
        .groupBy(col("_u"), col("_b"), col("_lseq"))
        .agg(count(lit(1)).as("_n"), min(col("_id")).as("_minid"),
          min(col("_us")).as("_minus"), max(col("_us")).as("_maxus"))
    }

    val (purchases, signups) = {
      val e = graft.Tables.load(spark, sfDir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      (e.filter(col("event_type") === "purchase").select("user_id", "event_id", "us"),
       e.filter(col("event_type") === "signup")
         .groupBy(col("user_id"), col("us"))
         .agg(max(col("event_id")).as("signup_event_id")))
    }
    time("q51 asof plain")(
      graft.operators.AsofJoin.asofBackward(purchases, signups, "user_id", "us", Seq("signup_event_id")))
    time("q53 asof bucketed")(
      graft.operators.AsofJoin.asofBackwardBucketed(purchases, signups, "user_id", "us",
        Seq("signup_event_id"), bucket = 86400000000L))

    spark.stop()
  }
}
