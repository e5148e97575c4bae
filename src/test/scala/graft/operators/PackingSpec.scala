package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed-prefix-sum packing vs the single-window reference: same
  * stream, same cuts, no doc-scale single-reducer window. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    val rng = new scala.util.Random(7L)
    (0L until 1000L).map(i => (i, (rng.nextInt(300) + 1).toLong))
  }.toDF("doc_id", "n_toks")

  /** The straggler form: one global ORDER BY window. */
  private def referencePack(budget: Long) = {
    val order = Window
      .orderBy(graft.Exact.hashOrder(col("doc_id"), 97), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("_cum", sum(col("n_toks")).over(order))
      .select(col("doc_id"), col("n_toks").as("n_tokens"),
        (col("_cum") - col("n_toks")).as("token_offset"),
        expr(s"CAST((_cum - n_toks) DIV $budget AS BIGINT)").as("seq_id"))
  }

  test("packDocs == single-window reference, stable across partitionings") {
    for (budget <- Seq(512L, 2048L)) {
      val ref = referencePack(budget)
      assertSameRows(Packing.packDocs(docs, "doc_id", "n_toks", budget),
        ref, s"budget=$budget")
      assertSameRows(
        Packing.packDocs(docs.repartition(13), "doc_id", "n_toks", budget),
        ref, s"budget=$budget repartitioned")
    }
  }

  test("packing conserves tokens and fills sequences to the budget") {
    val budget = 1024L
    val seqs = Packing.packSequences(docs, "doc_id", "n_toks", budget)
      .orderBy("seq_id").collect()
    val totalIn = docs.agg(sum("n_toks")).as[Long].head()
    assert(seqs.map(_.getAs[Long]("n_docs")).sum == 1000L)
    assert(seqs.map(_.getAs[Long]("n_tokens")).sum == totalIn)
    // streaming-pack invariant: every sequence's docs START inside its
    // budget window, so all but the last sequence carry ≥ budget tokens
    // only when a doc straddles INTO them... the sharp invariant is on
    // offsets: a sequence's token span [seq_id·B, end) begins before
    // its last doc's offset reaches the next boundary
    val ids = seqs.map(_.getAs[Long]("seq_id"))
    assert(ids.head == 0L && ids.toSet.size == ids.length)
    // no empty holes except where a giant doc swallows whole windows:
    // with max doc 300 < budget, ids must be consecutive
    assert(ids.zip(ids.tail).forall { case (a, b) => b == a + 1 },
      s"sequence ids must be gapless for docs smaller than the budget: ${ids.toSeq}")
  }

  test("an all-null token bucket propagates null instead of throwing") {
    // With buckets=1 every doc shares one hash bucket; all-null token
    // counts make that bucket's total null — r7's bare getLong NPE'd on
    // the driver where the old window path propagated the null.
    val nullDocs = Seq((1L, None: Option[Long]), (2L, None: Option[Long]))
      .toDF("doc_id", "n_toks")
    val out = Packing.packDocs(nullDocs, "doc_id", "n_toks", 1024L, buckets = 1)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out.forall(_.isNullAt(out.head.fieldIndex("n_tokens"))),
      "null token counts must stay null in the output")
    // mixed bucket: the non-null doc still packs normally at offset 0
    val mixed = Seq((1L, Some(5L)), (2L, None: Option[Long]))
      .toDF("doc_id", "n_toks")
    val packed = Packing.packDocs(mixed, "doc_id", "n_toks", 1024L, buckets = 1)
      .orderBy("doc_id").collect()
    assert(packed.head.getAs[Long]("token_offset") == 0L)
    assert(packed.head.getAs[Long]("seq_id") == 0L)
  }

  test("the doc-scale window is partitioned (no global single-reducer stage)") {
    val windows = Packing.packDocs(docs, "doc_id", "n_toks", 1024L)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    val (docScale, bucketScale) = windows.partition(
      _.windowExpressions.exists(_.name == "_lcum"))
    assert(docScale.nonEmpty && docScale.forall(_.partitionSpec.nonEmpty),
      s"the doc-scale running sum must partition by the hash bucket:\n$windows")
    // the only unpartitioned window is the offsets frame — input is one
    // row per bucket, bounded by the buckets argument, never doc-scale
    assert(bucketScale.forall(w =>
      w.windowExpressions.exists(_.toString.contains("_btot")) || w.partitionSpec.nonEmpty),
      s"unexpected unpartitioned window:\n$windows")
  }
}
