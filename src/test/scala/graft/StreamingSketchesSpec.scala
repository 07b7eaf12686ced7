package graft

import graft.operators.{Bloom, Cms}
import graft.streaming.StreamingSketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming CMS/Bloom state must equal the batch sketch of everything
  * that has arrived — exact frame equality, then identical probes. */
class StreamingSketchesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming CMS registers == batch sketch; estimates identical") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val q = StreamingSketches.cmsRegisterStream(
        input.toDF().toDF("k"), col("k"))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      val batch1 = (0 until 3000).map(i => s"w-${i % 70}") // skewed
      val batch2 = (0 until 1000).map(i => s"w-${i % 130}")
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val streamRegs = spark.sql("SELECT depth, bucket, n FROM cms_stream")
      val batchRegs = Cms.registers((batch1 ++ batch2).toDF("k"), col("k"))
      assert(streamRegs.count() <= Cms.D.toLong * Cms.W)
      assert(streamRegs.exceptAll(batchRegs).isEmpty &&
        batchRegs.exceptAll(streamRegs).isEmpty,
        "stream register state != batch registers")
      // a snapshot probes exactly like the batch sketch
      val keys = Seq("w-0", "w-42", "w-129", "absent").toDF("k")
      val se = Cms.estimates(streamRegs, keys, "k").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val be = Cms.estimates(batchRegs, keys, "k").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(se == be)
      // one-sided guarantee holds on the stream snapshot
      assert(se("w-0") >= (batch1 ++ batch2).count(_ == "w-0"))
    } finally q.stop()
  }

  test("streaming Bloom words == batch filter; membership identical") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val q = StreamingSketches.bloomWordStream(
        input.toDF().toDF("k"), col("k"))
      .writeStream.format("memory").queryName("bloom_stream")
      .outputMode("complete").start()
    try {
      val batch1 = (0 until 4000).map(i => s"id-$i")
      val batch2 = (3000 until 6000).map(i => s"id-$i")
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val streamWords = spark.sql("SELECT word_idx, word FROM bloom_stream")
      val batchWords = Bloom.build((batch1 ++ batch2).toDF("k"), col("k"))
      assert(streamWords.count() <= Bloom.MBits.toLong / 32)
      assert(streamWords.exceptAll(batchWords).isEmpty &&
        batchWords.exceptAll(streamWords).isEmpty,
        "stream word state != batch filter")
      // every inserted key is a member of the snapshot (no false negatives)
      val probe = Seq("id-0", "id-3500", "id-5999").toDF("k")
      val hits = Bloom.mightContain(streamWords, probe, "k").collect()
        .map(r => r.getString(0) -> r.getBoolean(1)).toMap
      assert(hits.values.forall(identity))
    } finally q.stop()
  }

  test("streaming Misra-Gries keeps every true-frequent key and the " +
      "exact row count across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val capacity = 16
    val input = MemoryStream[String]
    val q = graft.streaming.StreamingSketches.heavyHittersStream(
        input.toDF().toDF("k"), col("k"), capacity)
      .writeStream.format("memory").queryName("mg_stream")
      .outputMode("complete").start()
    try {
      // two hot keys spread across batches + a long noise tail
      val batch1 = Seq.fill(400)("hot-a") ++
        (0 until 600).map(i => s"noise-${i % 200}")
      val batch2 = Seq.fill(500)("hot-b") ++ Seq.fill(200)("hot-a") ++
        (0 until 300).map(i => s"noise-${200 + i % 100}")
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val snap = spark.sql("SELECT keys, rows FROM mg_stream").head()
      val keys = snap.getSeq[String](0).toSet
      val rows = snap.getLong(1)
      val all = batch1 ++ batch2
      assert(rows == all.length.toLong, "row count must be exact")
      assert(keys.size <= capacity)
      // MG guarantee: freq > rows/capacity ⇒ present, in any merge order
      val trueCounts = all.groupBy(identity).view.mapValues(_.size.toLong)
      val mustHave = trueCounts.filter(_._2 > rows / capacity).keys.toSet
      assert(mustHave.nonEmpty && mustHave.subsetOf(keys),
        s"missing true-frequent keys: ${mustHave.diff(keys)}")
    } finally q.stop()
  }
}
