package graft

import graft.operators.EvalMetrics
import graft.streaming.StreamingEmbedDrift
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming moments twin must be indistinguishable from the batch
  * diagonal-Fréchet: register state converges to the batch moments of
  * everything arrived (exact integers — no tolerance), and scoring a
  * snapshot against a frozen reference equals embedFrechetDiag on the
  * same data bit-for-bit. */
class StreamingEmbedDriftSpec extends AnyFunSuite {
  import SparkTestSession._

  test("stream moment registers converge to the batch moments across " +
      "interleaved micro-batches; snapshot drift vs the persisted " +
      "reference equals the batch embedFrechetDiag bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // reference corpus: even-id embeddings; live stream: odd-id
    // embeddings under the q_embed_fd affine drift (x·1.02 + 0.01)
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val refCorpus = emb.where(col("vec_id") % 2 === 0)
    val live = emb.where(col("vec_id") % 2 === 1)
      .select(col("vec_id"),
        transform(col("embedding"), x => x * 1.02 + 0.01)
          .as("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))

    val refPath = java.nio.file.Files
      .createTempDirectory("embed_drift_ref_").toString
    StreamingEmbedDrift.writeReferenceMoments(refCorpus, "embedding",
      refPath)

    val input = MemoryStream[(Long, Seq[Double])]
    val q = StreamingEmbedDrift.momentStream(
        input.toDF().toDF("vec_id", "embedding"), "embedding")
      .writeStream.format("memory").queryName("drift_stream")
      .outputMode("complete").start()
    try {
      // three interleaved micro-batches with an overlap-free split
      val (b1, rest) = live.splitAt(live.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      input.addData(b1.toSeq: _*)
      q.processAllAvailable()
      input.addData(b2.toSeq: _*)
      q.processAllAvailable()
      input.addData(b3.toSeq: _*)
      q.processAllAvailable()
      val snap = spark.sql("SELECT * FROM drift_stream")
      // exact state equality with the batch moments of all arrivals
      val allDf = live.toSeq.toDF("vec_id", "embedding")
      val batchMoments = EvalMetrics.vecMoments(allDf, "embedding")
      assert(snap.exceptAll(batchMoments).isEmpty &&
        batchMoments.exceptAll(snap).isEmpty,
        "stream moment state != batch moments")
      // the snapshot score IS the batch score — one fdFromMoments
      // kernel, two execution modes
      val streamScore = StreamingEmbedDrift.driftAgainst(spark,
        snap, refPath).collect().map(_.toString).toSeq
      // batch twin with the sides in the SAME (snapshot=A, ref=B)
      // orientation
      val batchScore = EvalMetrics.embedFrechetDiag(allDf, refCorpus,
        "embedding").collect().map(_.toString).toSeq
      assert(streamScore == batchScore,
        s"stream $streamScore != batch $batchScore")
      // drift is nonzero by construction (the affine shift moved both
      // mean and spread)
      assert(spark.sql("SELECT 1").count() == 1) // keep session warm
      val fd = StreamingEmbedDrift.driftAgainst(spark, snap, refPath)
        .head().getAs[Long]("fd_micro")
      assert(fd > 0L, s"planted drift must score > 0, got $fd")
      // a scale mismatch fails fast instead of comparing registers
      // quantized in different units
      val se = intercept[IllegalArgumentException] {
        StreamingEmbedDrift.driftAgainst(spark, snap, refPath,
          scale = 2048)
      }
      assert(se.getMessage.contains("scale"), se.getMessage)
    } finally q.stop()
  }

  test("moment frames merge by re-aggregation: sharded batch moments " +
      "sum to the whole-corpus moments (exact integers commute)") {
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val whole = EvalMetrics.vecMoments(emb, "embedding")
    val shards = (0 until 3).map(r =>
      EvalMetrics.vecMoments(emb.where(col("vec_id") % 3 === r),
        "embedding"))
    val merged = shards.reduce(_ unionByName _)
      .groupBy("dim")
      .agg(sum("n").as("n"), sum("s").as("s"), sum("ss").as("ss"))
    assert(merged.exceptAll(whole).isEmpty &&
      whole.exceptAll(merged).isEmpty,
      "sharded moments must merge to the whole-corpus moments")
  }
}
