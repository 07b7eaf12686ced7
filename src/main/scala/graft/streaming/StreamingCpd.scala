package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import graft.operators.Cpd

/** Streaming change-point detection: the batch CPD stage wired behind a
  * Structured Streaming source via `foreachBatch`.
  *
  * CPD is inherently windowed-batch (PELT needs the whole device-day
  * signal), so the streaming form is micro-batch re-analysis: each trigger
  * runs the UNCHANGED batch operator (`Cpd.candidateEvents`) over the new
  * feature rows and appends candidates to the sink — the same
  * batch/stream code-sharing pattern as the silver transform
  * ([[StreamingIngest]]). Late data is bounded by the upstream watermark;
  * idempotency downstream comes from the candidate hash id, exactly like
  * the reference's truncate-and-load / hash-keyed loader semantics
  * (`05_load_candidates_to_db.py`).
  */
object StreamingCpd {

  /** Wrap a streaming feature DataFrame into a candidate-appending writer.
    * Caller starts it with `.start()` after picking a sink via `sink`.
    */
  def candidateWriter(features: DataFrame, cfg: Cpd.Config = Cpd.Config())(
      sink: (Dataset[Cpd.Candidate], Long) => Unit)
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    features.writeStream
      .trigger(Trigger.ProcessingTime("10 seconds"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(Cpd.candidateEvents(batch, cfg), batchId)
      }
  }
}
