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
        .map(_.getLong(0))
      assert(got.length == 2, s"expected 2 unique docs, got ${got.length}")
      // batch twin: the stream key IS the batch exact-dedup key — the
      // surviving stream fingerprints must equal the batch-side
      // TextFunctions.fingerprint values row for row, so stream state and
      // batch fingerprint tables are joinable on this column
      val batch = Seq((1L, "alpha beta gamma"), (2L, "ALPHA  beta GAMMA"),
        (3L, "delta epsilon"), (4L, "delta  EPSILON"))
        .toDF("doc_id", "text")
        .withColumn("fingerprint",
          graft.functions.TextFunctions.fingerprint(col("text")))
        .select("fingerprint").distinct()
        .collect().map(_.getLong(0))
      assert(got.toSet == batch.toSet)
    } finally q.stop()
  }

  test("streaming line dedup keeps each line's first arrival and " +
      "matches the batch twin's surviving line set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val ts = java.sql.Timestamp.valueOf("2025-07-30 00:00:05")
    val docs = input.toDF().toDF("doc_id", "text", "event_ts")
    val q = graft.streaming.StreamingDedup
      .lineDedupStream(docs, "doc_id", "text", "event_ts")
      .writeStream.format("memory").queryName("line_dedup_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, "x\ny\nz", ts))
      q.processAllAvailable()
      // cross-batch: doc 2 repeats y and x, brings w; doc 3 is all-dup
      input.addData((2L, "y\nw\nx", ts), (3L, "z", ts))
      q.processAllAvailable()
      val survived = spark.sql(
          "SELECT doc_id, line FROM line_dedup_stream").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(survived == Set((1L, "x"), (1L, "y"), (1L, "z"), (2L, "w")))
      // batch twin on the same corpus (doc order == arrival order):
      // the surviving (doc, line) set must agree
      val batchDocs = Seq((1L, "x\ny\nz"), (2L, "y\nw\nx"), (3L, "z"))
        .toDF("doc_id", "text")
      val batch = graft.operators.Dedup
        .lineDedup(batchDocs, "doc_id", "text")
        .collect().flatMap(r => r.getString(3).split("\n")
          .filter(_.nonEmpty).map(l => (r.getLong(0), l))).toSet
      assert(survived == batch)
    } finally q.stop()
  }

  test("streaming curation filters junk, scrubs PII, and dedups — " +
      "narrow rules attach to the stream unchanged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val ts = java.sql.Timestamp.valueOf("2025-07-30 00:00:05")
    val good = "the quick brown fox jumps over the lazy dog and it was " +
      "a fine day for all of the animals in the field by the river"
    val withPii = good + " contact me at someone@example.com please"
    val docs = input.toDF().toDF("doc_id", "text", "event_ts")
    val q = graft.streaming.StreamingCuration
      .curateStream(docs, "text", "event_ts")
      .writeStream.format("memory").queryName("curated_stream")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, good, ts),
        (2L, "el perro corre por la calle y vive con la familia", ts),
        (3L, Seq.fill(12)("loop the loop and").mkString(" "), ts),
        (4L, withPii, ts),
        (5L, good, ts)) // duplicate of 1
      q.processAllAvailable()
      val rows = spark.sql("SELECT text FROM curated_stream").collect()
        .map(_.getString(0))
      // 2 dropped (lang), 3 dropped (repetition), 5 deduped vs 1
      assert(rows.length == 2, s"got ${rows.length}: ${rows.toSeq}")
      assert(rows.exists(_.contains("<EMAIL>")))
      assert(!rows.exists(_.contains("someone@")))
    } finally q.stop()
  }

  test("streaming curation rejects batch-only bowDedup up front") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "event_ts")
    val ex = intercept[IllegalArgumentException] {
      graft.streaming.StreamingCuration.curateStream(docs, "text",
        "event_ts", graft.operators.Curation.Rules(bowDedup = true))
    }
    assert(ex.getMessage.contains("batch-only"))
  }
}
