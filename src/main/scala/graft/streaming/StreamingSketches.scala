package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.udaf
import graft.operators.{Bloom, Cms, HeavyHitters}

/** Streaming twins of the frequency/membership sketches — with
  * [[StreamingHll]] this completes the streaming sketch family
  * (distinct counts / per-key frequencies / membership). Both maintain
  * their register frame as a native streaming aggregation whose state
  * is STRUCTURALLY bounded (CMS: ≤ D·W = 4096 registers; Bloom:
  * ≤ mBits/32 = 2048 words), so like the HLL twin — and unlike the
  * dedup twins — they need no watermark: constant state absorbs
  * unbounded key cardinality, which is the entire point of a sketch.
  *
  * Both DELEGATE to the batch expression chains ([[Cms.registers]],
  * [[Bloom.build]] — narrow projections + one keyed agg, stream-legal
  * in complete mode), the StreamingDedup.fingerprint discipline: one
  * addressing function, two execution modes. A register/word snapshot
  * from the stream is therefore directly unionable with batch shard
  * sketches via [[Cms.merged]] / [[Bloom.merged]], and probes exactly
  * like a batch sketch ([[Cms.estimates]] / [[Bloom.mightContain]]).
  */
object StreamingSketches {

  /** Continuously-maintained CMS register frame (depth, bucket, n) over
    * a stream of keys. Run with `outputMode("complete")` (≤ 4096 rows
    * per trigger); any snapshot feeds [[Cms.estimates]]. */
  def cmsRegisterStream(rows: DataFrame, key: Column): DataFrame =
    Cms.registers(rows, key)

  /** Continuously-maintained Bloom word frame (word_idx, word) over a
    * stream of keys. Run with `outputMode("complete")` (≤ 2048 rows per
    * trigger); any snapshot feeds [[Bloom.mightContain]]. bit_or is the
    * streaming-agg merge, identical to the batch OR. */
  def bloomWordStream(rows: DataFrame, key: Column): DataFrame =
    Bloom.build(rows, key)

  /** Continuously-maintained Misra-Gries frequent-items summary: one
    * global streaming aggregation whose state is the ≤ `capacity`
    * summary buffer. Streaming-legal because the Aggregator is
    * MERGEABLE (the Agarwal et al. construction) — each micro-batch's
    * partial merges into the running state exactly as batch partitions
    * merge. Summaries are merge-order-dependent, so a stream snapshot
    * need not equal the batch summary byte-for-byte; what survives any
    * order — and what the spec pins — is the MG guarantee: every key
    * with true frequency > rows/capacity is IN the snapshot, and `rows`
    * is exact. Verify candidates exactly against durable storage (the
    * batch [[HeavyHitters.topFrequent]] second phase) when exact counts
    * are needed. Emits one row (keys, counts, rows) per trigger in
    * complete mode. */
  def heavyHittersStream(rows: DataFrame, key: Column,
      capacity: Int = 64): DataFrame = {
    val agg = udaf(HeavyHitters.MisraGries(capacity))
    rows.select(agg(key.cast("string")).as("s"))
      .select("s.keys", "s.counts", "s.rows")
  }
}
