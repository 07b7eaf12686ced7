package graft

import java.nio.file.Files

import graft.streaming.StreamingIngest
import org.scalatest.funsuite.AnyFunSuite

class StreamingIngestSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming ingest dedups on row hash and applies the silver transform") {
    val dir = Files.createTempDirectory("graft-stream").toFile
    val header = "timestamp,device_id,state,software_state,system_engaged," +
      "current_speed,current_position,load_weight,prndl," +
      "parking_brake_applied,extras"
    // second file repeats a (device_id, timestamp) row → must dedup
    Files.writeString(new java.io.File(dir, "a.csv").toPath,
      s"""$header
         |2025-07-30 00:00:05.734539+00,dev-1,loading,start,t,0.1,"{33.2, -97.8, 250.0}",41500,d,f,
         |2025-07-30 00:00:06.234539+00,dev-1,loadToDump,start,t,1.5,"{33.2, -97.8, 251.0}",41000,d,f,
         |""".stripMargin)
    Files.writeString(new java.io.File(dir, "b.csv").toPath,
      s"""$header
         |2025-07-30 00:00:05.734539+00,dev-1,loading,start,t,0.1,"{33.2, -97.8, 250.0}",41500,d,f,
         |2025-07-30 00:00:07.000000+00,dev-2,dumping,stop,f,0.2,"{33.3, -97.9, 260.0}",90000,p,t,
         |""".stripMargin)

    val q = StreamingIngest.silverStream(spark, dir.getAbsolutePath)
      .writeStream.format("memory").queryName("silver_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT device_id, state, raw_event_hash_id FROM silver_stream")
        .collect()
      assert(rows.length == 3, s"expected 3 deduped rows, got ${rows.length}")
      assert(rows.map(_.getString(2)).distinct.length == 3)
      assert(rows.count(_.getString(0) == "dev-1") == 2)
    } finally q.stop()
  }

  test("streaming downsample finalizes buckets once the watermark passes") {
    val dir = Files.createTempDirectory("graft-stream-ds").toFile
    val header = "timestamp,device_id,state,software_state,system_engaged," +
      "current_speed,current_position,load_weight,prndl," +
      "parking_brake_applied,extras"
    Files.writeString(new java.io.File(dir, "a.csv").toPath,
      s"""$header
         |2025-07-30 00:00:05.000000+00,dev-1,loading,start,t,1.0,"{33.2, -97.8, 250.0}",41500,d,f,
         |2025-07-30 00:00:06.000000+00,dev-1,loading,start,t,3.0,"{33.2, -97.8, 251.0}",41000,d,f,
         |""".stripMargin)
    // the dedup's 30 s watermark is inherited by the downsample (chained
    // stateful operators share one event-time watermark)
    val silver = StreamingIngest.silverStream(spark, dir.getAbsolutePath,
      watermark = "30 seconds")
    val q = StreamingIngest
      .downsampleStream(silver, every = "5 seconds")
      .writeStream.format("memory").queryName("ds_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // append mode: nothing final yet — the watermark is still inside
      // the first bucket's window
      assert(spark.sql("SELECT * FROM ds_stream").count() == 0)
      // late-arriving batch 2 minutes on pushes the watermark past the
      // first bucket, which must then emit exactly once, finalized
      Files.writeString(new java.io.File(dir, "b.csv").toPath,
        s"""$header
           |2025-07-30 00:02:00.000000+00,dev-1,hauling,start,t,9.0,"{33.2, -97.8, 252.0}",40000,d,f,
           |""".stripMargin)
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT device_date, speed_mean, n FROM ds_stream").collect()
      assert(rows.length == 1, s"expected 1 finalized bucket, got ${rows.toSeq}")
      assert(rows(0).getString(0) == "dev-1_2025-07-30")
      assert(rows(0).getDouble(1) == 2.0) // mean(1.0, 3.0)
      assert(rows(0).getLong(2) == 2L)
    } finally q.stop()
  }
}
