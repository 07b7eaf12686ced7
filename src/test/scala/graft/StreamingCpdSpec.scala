package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.operators.Cpd
import graft.streaming.StreamingCpd
import org.scalatest.funsuite.AnyFunSuite

class StreamingCpdSpec extends AnyFunSuite {
  import SparkTestSession._

  test("foreachBatch CPD finds the planted step from a streamed feature file") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-cpd")
    // one device-day, 2 Hz, load-rate step at minute 20 (payload branch)
    val rows = (0 until 7200).map { i =>
      val minute = i / 120
      ("lake-605-8-0896_2024-07-30",
        new Timestamp(1722297600000L + i * 500L),
        Some(if (minute < 20) 0.0 else 400.0), 1.0, 0.0, true,
        f"hash-$i%05d")
    }
    rows.toDF("device_date", "timestamp", "load_weight_rate_of_change",
        "speed_rolling_avg_5s", "altitude_rate_of_change",
        "has_reliable_payload", "raw_event_hash_id")
      .write.mode("overwrite").parquet(dir.resolve("in").toString)

    val schema = spark.read.parquet(dir.resolve("in").toString).schema
    val stream = spark.readStream.schema(schema)
      .parquet(dir.resolve("in").toString)

    val collected = scala.collection.mutable.ArrayBuffer.empty[Cpd.Candidate]
    val q = StreamingCpd.candidateWriter(stream) { (cands, _) =>
      collected.synchronized { collected ++= cands.collect() }
    }.start()
    try q.processAllAvailable() finally q.stop()

    assert(collected.nonEmpty, "no streaming candidates")
    val stepMs = 1722297600000L + 20 * 60 * 1000
    assert(collected.exists(c =>
      math.abs(c.timestamp_start.getTime - stepMs) <= 5000))
    assert(collected.forall(_.device_id == "lake-605-8-0896"))
  }
}
