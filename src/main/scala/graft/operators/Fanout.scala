package graft.operators

import org.apache.spark.sql.DataFrame

/** Decouples CPU-kernel parallelism from input file layout.
  *
  * A parquet scan parallelizes across row groups, never *within* one, so
  * a compactly-written file (one row group — common for small fixture
  * files, and for production files written with a large block size)
  * scans as ONE task no matter what `maxPartitionBytes` asks for. Any
  * CPU-dense per-row kernel above such a scan — minhash signatures,
  * simhash votes, n-gram explodes, cosine scans — then runs serially on
  * one core while the rest of the cluster idles (found in round 6: q91's
  * apparent 100 s "regression" at sf0.1 was a single-task signature scan
  * racing 31 idle threads; the sf1 equivalent was fixed by rewriting the
  * files, but the driver's fixtures are read-only).
  *
  * [[forKernel]] widens such inputs with one round-robin shuffle, but
  * ONLY when the planned scan is narrower than the session's
  * parallelism: at 100 TB a scan has thousands of splits, the condition
  * is false, and no shuffle is added to the production plan. The check
  * runs the planner (cheap), never a job. Streaming frames pass through
  * untouched — micro-batch parallelism is the source's business.
  */
object Fanout {
  def forKernel(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    val planned = df.queryExecution.toRdd.getNumPartitions
    if (planned < target) df.repartition(target) else df
  }
}
