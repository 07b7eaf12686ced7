package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.EvalMetrics

/** Streaming distinct-n diversity — the sketch twin of
  * [[graft.operators.EvalMetrics.distinctNApprox]] for a LIVE
  * generation stream (the mode-collapse alarm wants to fire while the
  * generator runs, not after the corpus lands): the per-(group, order)
  * register frame is maintained as a native streaming aggregation
  * whose state is structurally bounded at |groups|·|orders|·4096 rows,
  * so — the [[StreamingHll]] argument — it needs NO watermark and is
  * safe in complete mode forever; the unbounded n-gram vocabulary that
  * makes exact streaming distinct-n impossible is absorbed by the
  * sketch. Registers carry bucket counts, so a snapshot also yields
  * EXACT totals (the ratio's denominator is never approximate).
  */
object StreamingDistinctN {

  /** Continuously-maintained (group, n, bucket, bucket_count, min_len)
    * register frame over a document stream. Run with
    * `outputMode("complete")`; feed any snapshot to
    * [[EvalMetrics.approxFromRegisters]] for the diversity report.
    *
    * DELEGATES to [[EvalMetrics.gramRegisters]] — the batch expression
    * chain (tokenize → per-order gram Generate → md5-56 bucket/rank →
    * one keyed agg) is stream-legal, and sharing it is what guarantees
    * stream snapshots and batch sketches stay merge-compatible (the
    * StreamingHll one-key-function/two-execution-modes discipline;
    * StreamingHllSpec pins snapshot == batch equality across
    * interleaved micro-batches). */
  def registerStream(docs: DataFrame, groupCol: String,
      textCol: String, orders: Seq[Int] = Seq(1, 2, 3)): DataFrame =
    EvalMetrics.gramRegisters(docs, groupCol, textCol, orders)
}
