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
}
