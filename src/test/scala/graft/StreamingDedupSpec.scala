package graft

import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingDedupSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming dedup keeps one doc per normalized text within the " +
      "watermark and matches the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val ts = java.sql.Timestamp.valueOf("2025-07-30 00:00:05")
    val docs = input.toDF().toDF("doc_id", "text", "event_ts")
    val q = StreamingDedup.dedupStream(docs, "text", "event_ts")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      // batch 1: two distinct texts + one same-batch duplicate
      input.addData(
        (1L, "alpha beta gamma", ts),
        (2L, "ALPHA  beta GAMMA", ts), // normalized duplicate of 1
        (3L, "delta epsilon", ts))
      q.processAllAvailable()
      // batch 2: cross-batch duplicate of 3 arrives within the watermark
      input.addData((4L, "delta  EPSILON", ts))
      q.processAllAvailable()
      val got = spark.sql("SELECT fingerprint FROM dedup_stream").collect()
        .map(_.getString(0))
      assert(got.length == 2, s"expected 2 unique docs, got ${got.length}")
      // batch twin: same fingerprints survive the batch exact dedup
      val batch = Seq((1L, "alpha beta gamma"), (2L, "ALPHA  beta GAMMA"),
        (3L, "delta epsilon"), (4L, "delta  EPSILON"))
        .toDF("doc_id", "text")
        .withColumn("fingerprint", StreamingDedup.fingerprint("text"))
        .select("fingerprint").distinct()
        .collect().map(_.getString(0))
      assert(got.toSet == batch.toSet)
    } finally q.stop()
  }
}
