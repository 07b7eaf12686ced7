package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication for a continuously-arriving document
  * corpus — the streaming twin of [[graft.operators.Dedup.exactDupGroups]]'
  * normalized-text fingerprint (so a pipeline can switch batch ↔ stream
  * without changing dedup semantics).
  *
  * Uses `dropDuplicatesWithinWatermark`: state for a fingerprint is
  * retained only until the event-time watermark passes it, so state size
  * is bounded by the dedup horizon (arrival-time skew window), not corpus
  * history — the property that keeps this runnable forever at ingest
  * scale. Exactly-once within the horizon; re-arrivals older than the
  * watermark are the deliberate trade (an unbounded-history exact dedup
  * is the batch operator's job in the periodic compaction pass).
  */
object StreamingDedup {

  /** Normalized-text fingerprint — the SAME key (same function, same
    * values) as the batch exact-dedup path
    * ([[graft.functions.TextFunctions.fingerprint]], xxhash64 of the
    * whitespace-collapsed lower text), so stream state and batch
    * fingerprint tables are directly joinable/comparable on this column. */
  def fingerprint(textCol: String): org.apache.spark.sql.Column =
    graft.functions.TextFunctions.fingerprint(col(textCol))

  /** Drop duplicate documents within the watermark horizon. `tsCol` must
    * be an event-time timestamp column. */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fingerprint", fingerprint(textCol))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Streaming LINE-grain dedup — the streaming twin of
    * [[graft.operators.Dedup.lineDedup]]: documents explode to
    * (doc, idx, line) rows, each line keyed by the batch operator's SAME
    * xxhash64 key, and a line hash seen within the watermark horizon is
    * dropped corpus-wide (first arrival wins — the stream-order
    * rendering of the batch argmin; under event-time skew inside one
    * micro-batch the engine keeps an arbitrary one, the standard
    * dropDuplicates contract). Docs are NOT reassembled in-stream —
    * emitting surviving (doc, idx, line) rows keeps state at one hash
    * per line instead of buffering whole documents; the downstream sink
    * regroups per doc if it needs page text (the batch operator's
    * row-local rebuild is the compaction-pass tool). State is bounded by
    * the horizon, exactly like [[dedupStream]]. */
  def lineDedupStream(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, watermark: String = "10 minutes"): DataFrame =
    docs
      .select(col(idCol), col(tsCol),
        posexplode(split(col(textCol), "\n")).as(Seq("line_idx", "line")))
      .withColumn("line_hash", xxhash64(col("line")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("line_hash")
}
