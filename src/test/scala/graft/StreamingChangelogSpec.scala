package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingChangelog
import graft.streaming.StreamingChangelog.LogOp

/** The streaming changelog view must converge to the batch
  * applyChangelog result from ANY arrival order — the sequence number,
  * not the stream, decides the winner. */
class StreamingChangelogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("shuffled log replay converges to the batch apply (deletes " +
      "tombstone; base keys untouched by the log survive)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(17)
    // keys 0..49; ~4 ops per key with distinct seqs; every 7th op is a
    // delete; keys 50..59 exist only in the base table
    val log = (0 until 200).map { i =>
      LogOp(i % 50L, 1000L + i, if (i % 7 == 0) "D" else "U",
        (i * 31 % 997).toLong)
    }
    val shuffled = rnd.shuffle(log)
    val input = MemoryStream[LogOp]
    val q = StreamingChangelog.stream(input.toDS())
      .writeStream.format("memory").queryName("cdc_stream")
      .outputMode("append").start()
    try {
      shuffled.grouped(37).foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // reader's view: max-seq row per key, deletes dropped
    val fin = spark.table("cdc_stream")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("k").orderBy(col("seq").desc)))
      .where(col("rk") === 1 && col("op") =!= "D")
      .select(col("k"), col("v"))
    val base = (0L until 60L).map(k => (k, -1L)).toDF("k", "v")
    val batch = graft.operators.TelemetryTransform.applyChangelog(
      base, log.toDF("k", "seq", "op", "v"), "k", "seq", "op")
    // streamed view covers log-touched keys; batch adds untouched base
    val streamed = fin.as[(Long, Long)].collect().toSet ++
      (50L until 60L).map((_, -1L))
    assert(streamed == batch.as[(Long, Long)].collect().toSet)
    // sanity: at least one key was actually tombstoned
    assert(streamed.size < 60)
  }
}
