package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_sessionize's claim is that `session_window` is the STREAMING-
  * native generalization of gaps-and-islands — this spec proves it:
  * the exact expression the batch query uses, run under Structured
  * Streaming with a watermark in append mode, emits the identical
  * session set once sessions pass the watermark. */
class StreamingSessionSpec extends AnyFunSuite {
  import SparkTestSession._

  test("session_window under watermark+append equals the batch sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1704067200000000L // 2024-01-01 UTC, micros
    val rnd = new scala.util.Random(31)
    // irregular per-user event times whose gaps straddle the 30-min
    // threshold (30-min grid ± up to 50-min jitter) — ms-aligned so
    // Timestamp round-trips exactly
    val rows = for { u <- 1L to 8L; k <- 0 until 40 } yield
      (u, base + k * 1800000000L + rnd.nextInt(3000) * 1000000L +
        u * 777000L)
    val sorted = rows.sortBy(_._2)
    def toTs(us: Long) = new java.sql.Timestamp(us / 1000)
    def sessionize(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        unix_micros(min("ts")).as("first_us"),
        unix_micros(max("ts")).as("last_us"))
      .select(col("user_id"), col("first_us"), col("last_us"),
        col("n_events"))
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val q = sessionize(input.toDS().toDF("user_id", "ts")
        .withWatermark("ts", "0 seconds"))
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      sorted.grouped(80).foreach { b =>
        input.addData(b.map { case (u, us) => (u, toTs(us)) }: _*)
        q.processAllAvailable()
      }
      // sentinel far past every real event: pushes the watermark so all
      // real sessions finalize and emit
      input.addData((999L, toTs(base + 10L * 86400000000L)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sess_stream")
      .where(col("user_id") =!= 999)
      .as[(Long, Long, Long, Long)].collect()
      .sortBy(t => (t._1, t._2)).toSeq
    val batch = sessionize(
        rows.map { case (u, us) => (u, toTs(us)) }.toDF("user_id", "ts"))
      .as[(Long, Long, Long, Long)].collect()
      .sortBy(t => (t._1, t._2)).toSeq
    assert(batch.nonEmpty && streamed == batch)
    // the fixture genuinely splits sessions (more sessions than users)
    assert(batch.size > 8, s"fixture degenerate: ${batch.size} sessions")
  }
}
