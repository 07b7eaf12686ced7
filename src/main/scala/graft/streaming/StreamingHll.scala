package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import graft.operators.Hll

/** Streaming distinct-count — the streaming twin of
  * [[graft.operators.Hll]]: the register frame is maintained as a
  * native streaming aggregation whose state is structurally bounded at
  * m = 4096 rows of (bucket, min_len), so unlike the dedup twins it
  * needs NO watermark — the sketch absorbs unbounded key cardinality in
  * constant state, which is the entire point of HLL and makes it the
  * rare streaming aggregate that is safe in complete mode forever.
  *
  * The per-row pipeline (portable md5 hash → bucket/suffix split →
  * bitlen rank) is the SAME expression chain as the batch operator, so
  * a register snapshot from this stream is directly unionable with
  * batch shard sketches ([[Hll.estimateFromRegisters]] accepts either).
  */
object StreamingHll {

  /** Continuously-maintained register frame over a stream of keys.
    * Run with `outputMode("complete")` (≤ m rows per trigger); feed any
    * snapshot to [[Hll.estimateFromRegisters]] for the count.
    *
    * DELEGATES to [[Hll.registers]] — the batch expression chain is
    * stream-legal (narrow selects + one keyed agg), and sharing it is
    * what guarantees stream state and batch sketches stay unionable
    * (the StreamingDedup.fingerprint discipline: one key function, two
    * execution modes). */
  def registerStream(rows: DataFrame, key: Column): DataFrame =
    Hll.registers(rows, key)
}
