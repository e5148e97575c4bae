package graft.operators

import org.apache.spark.sql.DataFrame

/** Decouples CPU-kernel parallelism from input file layout.
  *
  * A parquet scan parallelizes across row groups, never *within* one, so
  * a compactly-written file (one row group — common for small fixture
  * files, and for production files written with a large block size)
  * scans as ONE effective task no matter what `maxPartitionBytes` asks
  * for. Any CPU-dense per-row kernel above such a scan — minhash
  * signatures, simhash votes, n-gram explodes, cosine scans — then runs
  * serially on one core while the rest of the cluster idles (found in
  * round 6: q91's apparent 100 s "regression" at sf0.1 was a
  * single-task signature scan racing 31 idle threads; the sf1
  * equivalent was fixed by rewriting the files, but the driver's
  * fixtures are read-only).
  *
  * [[forKernel]] widens such inputs with one round-robin shuffle, but
  * ONLY when the input is actually narrower than the session's
  * parallelism. Two checks, both cheap:
  *   1. planned scan partitions (runs the planner, never a job) — but
  *      byte-range splits OVERESTIMATE effective parallelism for
  *      few-row-group parquet (a split without a row-group midpoint
  *      reads nothing), so when the planner claims enough partitions
  *      from FEWER files than cores,
  *   2. the parquet footers of those few files are read driver-side
  *      (bounded: only when file count < cores) and the real row-group
  *      count decides.
  * At 100 TB a scan has thousands of files and the file-count
  * short-circuit keeps production plans untouched — asserted by
  * reference equality in FanoutSpec. Streaming frames pass through —
  * micro-batch parallelism is the source's business.
  */
object Fanout {
  // "Exchange " at a word start = ShuffleExchangeExec (any partitioning:
  // hash/range/single/round-robin); BroadcastExchange / ReusedExchange
  // both have a letter immediately before "Exchange" and don't match.
  private val shuffleExchangeProbe = "(?<![A-Za-z])Exchange ".r

  def forKernel(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Under AQE, probing toRdd on a plan that CONTAINS shuffle
    // exchanges materializes its upstream query stages — real shuffle
    // jobs whose work the caller's own action then repeats. Pass
    // through instead: a shuffled input already runs at
    // spark.sql.shuffle.partitions width, so the narrow-layout problem
    // this operator fixes cannot occur. That reasoning holds ONLY for
    // shuffle exchanges: a narrow scan broadcast-joined to a dim keeps
    // the scan's 1-partition width, so Broadcast/ReusedExchange must
    // NOT trip the pass-through (r7 matched the bare substring
    // "Exchange" and skipped exactly those plans). The probe regex
    // requires "Exchange" at a word start — "BroadcastExchange" and
    // "ReusedExchange" have a letter before it. toRdd on a
    // broadcast-only plan materializes just the small-side broadcast
    // (bounded by the broadcast threshold), never a shuffle stage.
    // String probe because the AQE wrapper hides its plan from tree
    // traversal (no children; `inputPlan` predates exchange insertion),
    // but toString prints the initial plan — exchanges included —
    // without executing anything.
    if (shuffleExchangeProbe
        .findFirstIn(df.queryExecution.executedPlan.toString).isDefined)
      return df
    val planned = df.queryExecution.toRdd.getNumPartitions
    if (planned < target) return df.repartition(target)
    val files = df.inputFiles
    if (files.isEmpty || files.length >= target ||
      !files.forall(_.endsWith(".parquet"))) df
    else if (rowGroupCount(df.sparkSession, files, stopAt = target) < target)
      df.repartition(target)
    else df
  }

  /** Total parquet row groups across `files`, short-circuiting once
    * `stopAt` is reached (callers only care whether the count clears
    * the parallelism bar). Driver-side footer reads — callers bound the
    * file count. */
  private[operators] def rowGroupCount(
      spark: org.apache.spark.sql.SparkSession,
      files: Seq[String], stopAt: Int): Int = {
    val conf = spark.sessionState.newHadoopConf()
    var n = 0
    val it = files.iterator
    while (n < stopAt && it.hasNext) {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(it.next()), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try n += r.getRowGroups.size finally r.close()
    }
    n
  }
}
