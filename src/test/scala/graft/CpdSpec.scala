package graft

import java.sql.Timestamp

import graft.operators.Cpd
import org.scalatest.funsuite.AnyFunSuite

class CpdSpec extends AnyFunSuite {
  import SparkTestSession._

  /** 2 Hz telemetry for one device-day: a payload-reliable device with a
    * load step at t0+20min, and an unreliable device with a speed step at
    * t0+30min. FIXTURES F5 kernel fixture shape. */
  private def fixture() = {
    import spark.implicits._
    val t0 = 1722297600000000L // 2024-07-30 00:00:00 UTC in µs
    val rows = (for {
      (dev, payload) <- Seq(("lake-605-8-0896", true), ("lake-775g-2-2266", false))
      i <- 0 until 7200 // 2 Hz for 1 h
    } yield {
      val tsUs = t0 + i * 500000L
      val minute = i / 120
      val lw: Option[Double] =
        if (payload) Some(if (minute < 20) 0.0 else 400.0) else Some(0.0)
      val speed = if (!payload && minute >= 30) 12.0 else 1.0
      val alt = 0.0
      (s"${dev}_2024-07-30", new Timestamp(tsUs / 1000), lw, speed, alt,
        payload, f"hash-$dev-$i%05d")
    })
    rows.toDF("device_date", "timestamp", "load_weight_rate_of_change",
      "speed_rolling_avg_5s", "altitude_rate_of_change",
      "has_reliable_payload", "raw_event_hash_id")
  }

  test("payload device detects the load step; kinematic device the speed step") {
    val out = Cpd.candidateEvents(fixture()).collect()
    assert(out.nonEmpty)
    val byDev = out.groupBy(_.device_id)
    assert(byDev.keySet == Set("lake-605-8-0896", "lake-775g-2-2266"))

    // all bucket starts are 5s-aligned
    assert(out.forall(_.timestamp_start.getTime % 5000 == 0))

    // the planted steps (minute 20 / minute 30) are found within one bucket
    val stepA = 1722297600000L + 20 * 60 * 1000
    val stepB = 1722297600000L + 30 * 60 * 1000
    assert(byDev("lake-605-8-0896")
      .exists(c => math.abs(c.timestamp_start.getTime - stepA) <= 5000),
      s"payload step not found: ${byDev("lake-605-8-0896").map(_.timestamp_start).toSeq}")
    assert(byDev("lake-775g-2-2266")
      .exists(c => math.abs(c.timestamp_start.getTime - stepB) <= 5000),
      s"kinematic step not found: ${byDev("lake-775g-2-2266").map(_.timestamp_start).toSeq}")

    // hash mapping: earliest raw row of the bucket
    assert(out.forall(_.raw_event_hash_id.startsWith("hash-")))
  }

  test("insufficient data gates: tiny partitions yield no candidates") {
    import spark.implicits._
    val t0 = 1722297600000L
    val tiny = (0 until 15).map { i =>
      ("dev-x_2024-07-30", new Timestamp(t0 + i * 500L), Some(1.0), 1.0, 0.0,
        true, s"h$i")
    }.toDF("device_date", "timestamp", "load_weight_rate_of_change",
      "speed_rolling_avg_5s", "altitude_rate_of_change",
      "has_reliable_payload", "raw_event_hash_id")
    assert(Cpd.candidateEvents(tiny).collect().isEmpty)
  }

  test("partition metrics report gate statuses and reduction ratio") {
    import spark.implicits._
    val good = fixture()
    val t0 = 1722297600000L
    val tiny = (0 until 10).map { i =>
      ("dev-tiny_2024-07-30", new java.sql.Timestamp(t0 + i * 500L),
        Some(1.0), 1.0, 0.0, true, s"t$i")
    }.toDF("device_date", "timestamp", "load_weight_rate_of_change",
      "speed_rolling_avg_5s", "altitude_rate_of_change",
      "has_reliable_payload", "raw_event_hash_id")
    val m = Cpd.partitionMetrics(good.unionByName(tiny))
      .collect().map(r => r.getAs[String]("device_date") -> r).toMap
    assert(m("dev-tiny_2024-07-30").getAs[String]("status") == "insufficient_data")
    assert(m("dev-tiny_2024-07-30").getAs[Long]("change_points") == 0)
    val ok = m("lake-605-8-0896_2024-07-30")
    assert(ok.getAs[String]("status") == "success")
    assert(ok.getAs[Long]("original_records") == 7200)
    assert(ok.getAs[Long]("downsampled_records") == 720)
    assert(ok.getAs[Long]("change_points") > 0)
    assert(math.abs(ok.getAs[Double]("data_reduction_ratio") - 0.1) < 1e-9)
  }
}
