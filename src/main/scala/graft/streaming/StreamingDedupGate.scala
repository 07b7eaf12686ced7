package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.DedupIndex

/** Streaming ingest gate over the persisted dedup index — the
  * continuous form of the [[graft.operators.DedupIndex]] cycle
  * (probe → reject hits → append survivors): every micro-batch of
  * crawled documents is probed against the index, near-duplicates of
  * ANYTHING already admitted (the seed corpus or a survivor of an
  * earlier micro-batch) are rejected, and the survivors are appended
  * to both the output corpus and the index itself.
  *
  * Built on `foreachBatch` deliberately, not on stream-static joins:
  * the probe needs batch-only plan shapes (candidate dedup, broadcast
  * of the batch side) AND the index must GROW as batches are admitted
  * — a stream-static join snapshots the static side per batch but
  * cannot express "batch N+1 probes against batch N's survivors"
  * without the append in between. Inside `foreachBatch` each
  * micro-batch is an ordinary DataFrame, so the whole batch operator
  * is reused verbatim (the one-kernel-two-modes discipline); exactness
  * of the per-batch step is therefore [[DedupIndex.probe]]'s own
  * oracle-checked contract.
  *
  * State lives entirely in the index directories — the streaming query
  * itself is stateless (no watermark, no state store), so a restart
  * resumes from the checkpoint with the index already reflecting every
  * committed batch. At 100 TB the index is the same partitioned
  * parquet the batch path uses; per-trigger cost is batch-sized
  * banding + candidate-sized verification, never corpus-sized. */
object StreamingDedupGate {

  /** Start the gate: `docs` is a streaming DataFrame of
    * (idCol, textCol); survivors land in `outPath` (append-only
    * parquet) and are appended to the index at `indexPath` (which must
    * already exist — seed it with [[DedupIndex.build]] on the initial
    * corpus). Scope note: the gate rejects duplicates of ADMITTED
    * documents; two near-duplicates arriving in the SAME micro-batch
    * both survive (run [[graft.operators.Dedup.minhashDupPairs]]
    * within the batch first if intra-batch dedup is also wanted). */
  def start(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, outPath: String, checkpoint: String,
      threshold: Double = 0.5): StreamingQuery = {
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // the micro-batch feeds three consumers (probe, anti-join,
        // append) — pin it so the source is read once
        val b = batch.localCheckpoint()
        val hits = DedupIndex.probe(spark, indexPath, b, idCol, textCol,
            threshold)
          .select(col("batch_id").as("_hit_id")).distinct()
        val survivors = b.join(broadcast(hits),
            b(idCol) === col("_hit_id"), "left_anti")
          .localCheckpoint()
        survivors.write.mode("append").parquet(outPath)
        DedupIndex.append(survivors, idCol, textCol, indexPath)
        graft.operators.Caches.releaseResult(b)
        graft.operators.Caches.releaseResult(survivors)
        ()
      }
      .start()
  }
}
