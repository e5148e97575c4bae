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

  test("zorderKey interleaves bits (hand values) and orders locally") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L), (0xFFFFFFFFL, 0L))
      .toDF("a", "b")
      .select(Bucketing.zorderKey(col("a"), col("b"))).as[Long].collect().toSeq
    // interleave(a even, b odd): (3,5) = a bits {0,1} + b bits {0,2}
    //   → z bits {0,2} ∪ {1,5} = 0b100111 = 39
    assert(got == Seq(0L, 1L, 2L, 3L, 39L, 0x5555555555555555L), s"got $got")
  }

  test("rankQuantize: order-preserving, equal-population, wide-domain safe") {
    // strided 37-bit ids (the sf1 MakeScale shape that defeated raw
    // zorderKey): quantization must preserve order and balance buckets
    val ids = (0L until 64L).map(i => (i / 8) * 108000000000L + i)
    val df = ids.toDF("user_id")
    val q = Bucketing.rankQuantize(df, "user_id", 8)
      .orderBy("user_id")
      .select(col("user_id"), col("user_id_q")).as[(Long, Int)].collect()
    // monotone in user_id
    assert(q.map(_._2).sliding(2).forall(p => p(0) <= p(1)), q.mkString(","))
    // equal population: 64 values into 8 buckets = 8 each
    val pops = q.groupBy(_._2).view.mapValues(_.length).toMap
    assert(pops.values.toSet == Set(8), s"unbalanced: $pops")
    assert(pops.keySet == (0 until 8).toSet)
  }

  test("rankQuantize plans no global window (near-unique dim is the motivating case)") {
    // r7 shape: NTILE over Window.orderBy (no partition) + forced
    // broadcast of the full distinct mapping — for near-unique ids the
    // distinct set is ~|corpus|, i.e. a single-reducer window and an
    // over-limit broadcast on the write path. The rewrite must plan
    // only partitioned windows.
    val df = (0L until 5000L).map(i => i * 37L).toDF("user_id")
    val out = Bucketing.rankQuantize(df, "user_id", 16)
    val global = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty, "rankQuantize must not plan an unpartitioned window")
    // and the quantization itself stays correct at this size: NTILE
    // semantics, 5000 = 16·312 + 8 → the first 8 buckets take 313
    val pops = out.groupBy("user_id_q").count()
      .as[(Int, Long)].collect().toMap
    assert(pops.keySet == (0 until 16).toSet, s"missing buckets: $pops")
    assert((0 until 16).forall(b => pops(b) == (if (b < 8) 313L else 312L)),
      s"unbalanced: $pops")
  }

  test("z-order layout prunes 2-D box scans that a 1-D sort cannot") {
    def recordsRead(df: org.apache.spark.sql.DataFrame): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            acc.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        df.collect()
        // the listener bus is async — poll until the count stabilizes
        var last = -1L
        var spins = 0
        while (acc.get() != last && spins < 50) {
          last = acc.get(); Thread.sleep(100); spins += 1
        }
        acc.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    // deterministic 200k-point grid over a 1024x1024 domain
    val rng = new scala.util.Random(3L)
    val pts = (0 until 200000).map { _ =>
      (rng.nextInt(1024).toLong, rng.nextInt(1024).toLong)
    }.toDF("x", "y")
    val flat = java.nio.file.Files.createTempDirectory("graft-xsort").toString
    val zdir = java.nio.file.Files.createTempDirectory("graft-zord").toString
    // baseline: the same file count, sorted on x only
    pts.repartitionByRange(48, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(flat)
    Bucketing.writeZOrdered(pts, zdir, "x", "y", numFiles = 48)
    // box predicate selective in BOTH dims: x keeps ~half, y ~10%
    def box(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("x") < 500 && col("y") < 100)
    val expected = box(pts).count()
    val flatDf = box(spark.read.parquet(flat))
    val zDf = box(spark.read.parquet(zdir))
    assert(flatDf.count() == expected && zDf.count() == expected,
      "layout must not change results")
    val flatRead = recordsRead(flatDf)
    val zRead = recordsRead(zDf)
    info(s"records decoded: x-sorted=$flatRead z-ordered=$zRead " +
      f"(${flatRead.toDouble / zRead}%.1fx pruning win)")
    // x-sort decodes every row group intersecting x<500 (~half the
    // table: y stats are useless there); the z-layout's row groups are
    // compact in BOTH dims, so most fail the y predicate's min/max
    assert(zRead < flatRead / 2,
      s"z-order must prune row groups the 1-D sort cannot: z=$zRead flat=$flatRead")
  }

  test("compact: many small files coalesce; one giant row group becomes splittable") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    val data = (1 to 20000).map(i => (i.toLong, s"row payload number $i padded")).toDF("id", "s")

    // fragmented landing: 64 tiny files
    data.repartition(64).write.parquet(s"$dir/frag")
    val frag = spark.read.parquet(s"$dir/frag")
    Bucketing.compact(frag, s"$dir/compacted")
    val nOut = new java.io.File(s"$dir/compacted")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(nOut == 1, s"small input must compact to one file, got $nOut")
    assertSameRows(spark.read.parquet(s"$dir/compacted"), data, "compaction content")

    // monolithic landing: coalesce(1) + huge block size = ONE row group
    // (byte-range splits can't parallelize it — the round-6 layout bug)
    data.coalesce(1).write
      .option("parquet.block.size", 512 * 1024 * 1024).parquet(s"$dir/mono")
    Bucketing.compact(spark.read.parquet(s"$dir/mono"), s"$dir/fixed",
      rowGroupBytes = 64 * 1024)
    def groups(p: String) = Fanout.rowGroupCount(
      spark, spark.read.parquet(p).inputFiles.toSeq, stopAt = 1000)
    assert(groups(s"$dir/mono") == 1,
      "precondition: monolith is a single row group")
    assert(groups(s"$dir/fixed") > 1,
      s"compacted layout must be splittable across row groups, got ${groups(s"$dir/fixed")}")
    assertSameRows(spark.read.parquet(s"$dir/fixed"), data, "re-layout content")
  }
}
