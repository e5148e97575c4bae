package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class FanoutSpec extends SparkSpec {

  test("narrow scan widens to the session's parallelism") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fanout").toString
    // coalesce(1) + one tiny file = a single-split, single-row-group
    // scan — the exact layout that serialized q91's signature kernel
    (1 to 100).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/t")
    val df = spark.read.parquet(s"$dir/t")
    assert(df.queryExecution.toRdd.getNumPartitions == 1)
    val wide = Fanout.forKernel(df)
    assert(wide.queryExecution.toRdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // same rows, just redistributed
    assertSameRows(wide, df, "fanout must not change content")
  }

  test("single-row-group file widens even when byte-range splits LOOK plentiful") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fanout-rg").toString
    // one ~1 MB file, ONE row group: with tiny maxPartitionBytes the
    // planner claims many byte-range partitions, but only the split
    // holding the row-group midpoint ever produces rows — planned
    // partitions overestimate effective parallelism and the footer
    // check must catch it
    (1 to 30000).map(i => (i.toLong, s"padding payload row $i"))
      .toDF("id", "s").coalesce(1)
      .write.option("parquet.block.size", 512 * 1024 * 1024)
      .parquet(s"$dir/t")
    val sc = spark.newSession()
    sc.conf.set("spark.sql.files.maxPartitionBytes", (64 * 1024).toString)
    val df = sc.read.parquet(s"$dir/t")
    assert(df.queryExecution.toRdd.getNumPartitions >=
      spark.sparkContext.defaultParallelism,
      "precondition: planner claims enough byte-range splits")
    val wide = Fanout.forKernel(df)
    assert(!(wide eq df), "one effective row group must trigger fan-out")
    assert(wide.queryExecution.toRdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("already-wide input passes through with NO added shuffle") {
    import spark.implicits._
    val df = (1 to 100).toDF("id")
      .repartition(spark.sparkContext.defaultParallelism)
    // reference equality: the production (wide-scan) path adds nothing
    assert(Fanout.forKernel(df) eq df)
  }

  test("plans containing an exchange pass through WITHOUT running jobs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fanout-ex").toString
    (1 to 1000).toDF("id").coalesce(1).write.mode("overwrite").parquet(s"$dir/t")
    // a derived frame: narrow scan UNDER an aggregation exchange — the
    // r6 probe (toRdd under AQE) would materialize the shuffle stage
    // here, silently executing the upstream work twice for callers like
    // chunkDupStats / kmeansCentroids
    val derived = spark.read.parquet(s"$dir/t")
      .groupBy(($"id" % 7).as("k")).count()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = Fanout.forKernel(derived)
      assert(out eq derived, "exchange-bearing plan must pass through")
      Thread.sleep(500) // let any (wrongly) submitted job reach the bus
      assert(jobs.get() == 0, s"probe must not submit jobs, ran ${jobs.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("broadcast-only plan still widens (no shuffle to hide behind)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.broadcast
    val dir = java.nio.file.Files.createTempDirectory("fanout-bc").toString
    (1 to 100).toDF("id").coalesce(1).write.mode("overwrite").parquet(s"$dir/t")
    val dim = (1 to 100).map(i => (i, s"tag$i")).toDF("id", "tag")
    // narrow scan broadcast-joined to a dim: the join preserves the
    // scan's 1-partition width, so the kernel above it still runs on
    // one core — the r7 probe matched the substring "Exchange" against
    // "BroadcastExchange" and wrongly passed this plan through
    val joined = spark.read.parquet(s"$dir/t").join(broadcast(dim), "id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), s"fixture must broadcast:\n$plan")
    val wide = Fanout.forKernel(joined)
    assert(!(wide eq joined), "broadcast-only plan must get the layout probe")
    assert(wide.queryExecution.toRdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assertSameRows(wide, joined, "fanout must not change join content")
  }

  test("streaming frames pass through untouched") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Int].toDF()
    assert(Fanout.forKernel(stream) eq stream)
  }
}
