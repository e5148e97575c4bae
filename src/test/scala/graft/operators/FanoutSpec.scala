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

  test("already-wide input passes through with NO added shuffle") {
    import spark.implicits._
    val df = (1 to 100).toDF("id")
      .repartition(spark.sparkContext.defaultParallelism)
    // reference equality: the production (wide-scan) path adds nothing
    assert(Fanout.forKernel(df) eq df)
  }

  test("streaming frames pass through untouched") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Int].toDF()
    assert(Fanout.forKernel(stream) eq stream)
  }
}
