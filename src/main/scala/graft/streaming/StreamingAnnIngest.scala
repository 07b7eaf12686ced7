package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.AnnIndex

/** Streaming vector ingest into the persisted [[graft.operators.AnnIndex]]
  * — the vector-table twin of [[StreamingDedupGate]]: every micro-batch
  * of embeddings is (optionally) drift-scored against the index's
  * frozen build-time moments, appended into its cell directories, and
  * every `compactEvery`-th batch the index maintains itself. This is
  * the serving loop a continuously-embedded corpus needs: the index
  * grows batch by batch, the drift signal that says "the quantizer no
  * longer fits what is arriving" accrues as a queryable time series
  * instead of a decision nobody is equipped to make
  * ([[graft.operators.AnnIndex.driftSince]]'s instrument, run at the
  * only moment it is free — the batch is already in hand), and the
  * small-files accumulation is repaired inside the loop that creates
  * it.
  *
  * Built on `foreachBatch` for the same reasons as the gate: appends
  * must mutate the index BETWEEN batches, and the existence check
  * needs batch-only plan shapes. Replay safety: `foreachBatch` is
  * AT-LEAST-ONCE, and a blind re-append would duplicate every replayed
  * vector (duplicate ids then occupy top-k rank slots — the r15 advice
  * failure mode at the streaming grain). The batch step is therefore
  * made idempotent at vector-id grain (globally-unique ids, the crawl
  * contract):
  *
  *  - the batch is ASSIGNED first (row-local, broadcast centroids);
  *    its distinct cells — bounded by min(|batch|, nlist) — scope an
  *    existence scan to exactly the partitions the batch could live
  *    in, so the check costs cells-touched reads, never a corpus scan;
  *  - already-present ids (the replay) are dropped by a
  *    batch-bounded semi-join collapse + broadcast anti-join (the
  *    [[graft.operators.DedupIndex.probe]] plan discipline: the big
  *    side streams, only batch-sized frames broadcast);
  *  - the drift row (when `driftOut` is set) lands in a PER-EPOCH
  *    directory written with overwrite, so a replayed epoch rewrites
  *    its row instead of appending a second copy.
  *
  * All state lives in the index tree + the drift table, so a restart
  * resumes from the checkpoint with both reflecting every committed
  * batch. Per-trigger cost: one |batch|-row assignment, one
  * cell-scoped existence check, one additive write, and (optionally)
  * one |dim|-row drift aggregate. */
object StreamingAnnIngest {

  /** Start the ingest: `vectors` is a streaming DataFrame of
    * (idCol, vecCol); the index at `indexPath` must already exist
    * (seed it with [[graft.operators.AnnIndex.build]]).
    *
    * `driftOut` (when non-empty) receives one row per micro-batch —
    * the [[graft.operators.AnnIndex.driftSince]] output plus a
    * `batch_epoch` column, under `driftOut/ingest_batch=<epoch>` —
    * scored BEFORE the append, so the series reads "what arrived"
    * against the build-time distribution. Requires the index to carry
    * frozen moments (any [[graft.operators.AnnIndex.build]] since the
    * instrument; run freezeMoments on older trees first).
    *
    * `compactEvery > 0` folds [[graft.operators.AnnIndex.compact]]
    * into the loop before every Nth batch (the [[StreamingDedupGate]]
    * argument verbatim: foreachBatch serializes the loop's own
    * batches, the loop owns the index, compact recovers its own
    * crashed state first, and the failed epoch replays). */
  def start(vectors: DataFrame, idCol: String, vecCol: String,
      indexPath: String, checkpoint: String,
      driftOut: String = "", compactEvery: Int = 0): StreamingQuery = {
    require(compactEvery >= 0,
      s"compactEvery=$compactEvery must be >= 0 (0 = never)")
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        if (compactEvery > 0 && epoch > 0 && epoch % compactEvery == 0)
          AnnIndex.compact(batch.sparkSession, indexPath)
        ingestBatch(batch.sparkSession, batch, idCol, vecCol, indexPath,
          if (driftOut.isEmpty) None else Some(driftOut), epoch)
      }
      .start()
  }

  /** One idempotent ingest step — package-visible so the spec can
    * replay it and pin the exactly-once-at-id-grain contract. */
  private[graft] def ingestBatch(spark: SparkSession, batch: DataFrame,
      idCol: String, vecCol: String, indexPath: String,
      driftOut: Option[String], epoch: Long): Unit = {
    val chks = scala.collection.mutable.ListBuffer[DataFrame]()
    try {
      // the micro-batch feeds up to three consumers (drift, assign,
      // anti-join) — pin it so the source is read once
      val b = batch.localCheckpoint()
      chks += b
      // an empty trigger (restart hiccup, idle source) has nothing to
      // append AND no distribution to score — fdFromMoments would
      // rightly fail its missing-dimension guard on an empty side
      if (b.isEmpty) return
      driftOut.foreach { out =>
        AnnIndex.driftSince(spark, indexPath, b, vecCol)
          .withColumn("batch_epoch", lit(epoch))
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$out/ingest_batch=$epoch")
      }
      val assigned = AnnIndex.assigned(b, idCol, vecCol, indexPath)
        .localCheckpoint()
      chks += assigned
      // existence check scoped to the batch's OWN cells (partition
      // pruning bounds the scan by what the batch touches, not the
      // corpus), collapsed to a batch-bounded id set by a semi-join
      // so the anti-join's build side is always broadcast-sized
      val cells = assigned.select("cell").distinct()
        .collect().map(_.getInt(0)).toSeq
      val existing = spark.read.parquet(s"$indexPath/assignments")
        .where(col("cell").isin(cells: _*))
        .select("id")
        .join(broadcast(assigned.select("id")), Seq("id"), "left_semi")
      val fresh = assigned.join(broadcast(existing), Seq("id"),
        "left_anti")
      AnnIndex.appendAssigned(fresh, indexPath)
    } finally chks.foreach(graft.operators.Caches.releaseResult)
  }

  /** Read the accumulated drift series at `driftOut` — one row per
    * committed micro-batch, ordered by epoch. The monitoring query a
    * serving pipeline alerts on (the dedup gate has no analogue: its
    * admission decisions ARE its signal; the vector index's quantizer
    * degrades silently, which is the point of the series). */
  def driftSeries(spark: SparkSession, driftOut: String): DataFrame =
    spark.read.parquet(driftOut).orderBy("batch_epoch")
}
