import org.apache.spark.sql.SparkSession
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = new java.io.PrintWriter(args.head)
    for (name <- args.tail) {
      val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      out.println(s"===== $name =====")
      out.println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      out.println()
    }
    out.close()
    spark.stop()
  }
}
