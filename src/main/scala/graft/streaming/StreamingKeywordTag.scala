package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.KeywordTag

/** Streaming lexicon monitor — the streaming twin of
  * [[graft.operators.KeywordTag]]: live per-(tag, term) occurrence
  * totals over a document stream (the shape of a PII-term / blocklist
  * alarm on an ingest feed). State is structurally bounded at
  * |lexicon| rows regardless of stream volume — the automaton reduces
  * every document to a fixed-width count vector BEFORE the stateful
  * aggregate, so like [[StreamingHll]] it needs no watermark and is
  * safe in complete mode forever.
  *
  * DELEGATES to [[KeywordTag.tagCounts]] — the batch pipeline (narrow
  * scan UDF → posexplode → one keyed agg) is stream-legal as-is, and
  * sharing the body is what guarantees a stream snapshot equals the
  * batch answer over the same arrived documents (the
  * StreamingDedup.fingerprint discipline: one kernel, two execution
  * modes). */
object StreamingKeywordTag {

  /** Continuously-maintained (tag, term, total, docs) frame; run with
    * `outputMode("complete")` (≤ |lexicon| rows per trigger). */
  def tagStream(docs: DataFrame, idCol: String, textCol: String,
      lexicon: Seq[(String, String)]): DataFrame =
    KeywordTag.tagCounts(docs, idCol, textCol, lexicon)
}
