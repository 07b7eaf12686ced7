package graft

import graft.streaming.StreamingEwma
import graft.streaming.StreamingEwma.Obs
import graft.operators.Downsample
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Streaming EWMA must equal the batch fold row-for-row when the
  * stream replays the same series in order — same integer recurrence,
  * one long of state per series. */
class StreamingEwmaSpec extends AnyFunSuite {
  import SparkTestSession._

  private def series: Seq[Obs] =
    (1L to 40L).map { i =>
      val g = if (i % 2 == 0) "s-even" else "s-odd"
      Obs(g, i, i, (i * 37) % 100)
    }

  test("stream replay equals the batch fold exactly; state is one long") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Obs]
    val q = StreamingEwma.ewmaStream(input.toDS())
      .writeStream.format("memory").queryName("ewma_stream")
      .outputMode("append").start()
    try {
      // two micro-batches split mid-series: state must carry across
      val (b1, b2) = series.splitAt(17)
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val streamed = spark.sql(
          "SELECT series, id, x_m, ewma_m FROM ewma_stream")
        .as[(String, Long, Long, Long)].collect().sortBy(_._2)
      val batch = Downsample.ewmaQuantized(
          series.toDF("series", "ord", "id", "x_m"),
          Seq("series"), Seq("ord"), "id", col("x_m"))
        .select(col("series"), col("id"), col("x_m"), col("ewma_m"))
        .as[(String, Long, Long, Long)].collect().sortBy(_._2)
      assert(streamed.length == 40)
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("first observation seeds e1 = x1 even when x1 = 0") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Obs]
    val q = StreamingEwma.ewmaStream(input.toDS())
      .writeStream.format("memory").queryName("ewma_seed")
      .outputMode("append").start()
    try {
      input.addData(Obs("s", 1, 1, 0), Obs("s", 2, 2, 100))
      q.processAllAvailable()
      val rows = spark.sql("SELECT id, ewma_m FROM ewma_seed")
        .as[(Long, Long)].collect().sortBy(_._1)
      // seeded at 0 (NOT treated as missing state): e2 = (200+0) div 10
      assert(rows.toSeq == Seq((1L, 0L), (2L, 20L)))
    } finally q.stop()
  }
}
