package graft

import graft.operators.KeywordTag
import graft.streaming.StreamingKeywordTag
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingKeywordTagSpec extends AnyFunSuite {
  import SparkTestSession._

  test("stream snapshot equals the batch tag counts over all arrived " +
      "docs, across interleaved micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lexicon = Seq("table" -> "schema", "able" -> "schema",
      "he" -> "pronoun", "zzz" -> "none")
    val input = MemoryStream[(Long, String)]
    val q = StreamingKeywordTag.tagStream(
        input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", lexicon)
      .writeStream.format("memory").queryName("kw_stream")
      .outputMode("complete").start()
    try {
      val batch1 = Seq((1L, "the table is able"), (2L, "no hits here"))
      val batch2 = Seq((3L, "table table"), (4L, "she shed hers"))
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM kw_stream").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSet
      val want = KeywordTag.tagCounts(
          (batch1 ++ batch2).toDF("doc_id", "text"),
          "doc_id", "text", lexicon).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(got == want, s"stream $got vs batch $want")
      // bounded-state contract: the frame never exceeds |lexicon| rows
      assert(got.size == lexicon.size)
    } finally q.stop()
  }
}
