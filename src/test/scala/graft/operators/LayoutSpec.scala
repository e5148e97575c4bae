package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Physical-layout guards: bucketing eliminates the join shuffle;
  * partition layout prunes the scan. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join plans with zero Exchange nodes") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft-wh")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val facts = (1L to 5000L).map(i => (i % 97, s"f$i", i * 1.5)).toDF("k", "tag", "v")
      val dims = (0L to 96L).map(i => (i, s"dim$i")).toDF("k", "name")
      Bucketing.writeBucketed(facts, "graft_facts_b", "k", 8, Seq("k"))
      Bucketing.writeBucketed(dims, "graft_dims_b", "k", 8, Seq("k"))
      val joined = Bucketing.bucketedJoin(spark, "graft_facts_b", "graft_dims_b", "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 5000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10485760L)
      spark.sql("DROP TABLE IF EXISTS graft_facts_b")
      spark.sql("DROP TABLE IF EXISTS graft_dims_b")
    }
  }

  test("partitioned layout: month predicate prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val events = (1 to 1200).map(i =>
      (i.toLong, (i % 12) + 1, s"e$i")).toDF("id", "month", "payload")
    Bucketing.writePartitioned(events, dir, "month")
    val one = spark.read.parquet(dir).filter(col("month") === 3)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(month"),
      s"month filter must become a partition filter:\n$plan")
    assert(one.count() == 100)
    // physical check: only the month=3 directory is listed in the scan
    assert(plan.contains("month=3") || !plan.contains("month=4"), plan)
  }
}
