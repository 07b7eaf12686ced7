package graft

import java.sql.Timestamp

import graft.operators.Downsample
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Tumbling-bucket semantics against the polars `group_by_dynamic(every=5s,
  * period=5s, closed="left")` behavior the CPD downsample replicates
  * (`05_cpd_orchestrator_polars.py:263-276`): epoch-aligned buckets,
  * boundary rows belong to the bucket they OPEN, first-in-bucket picks the
  * earliest row deterministically.
  */
class DownsampleSpec extends AnyFunSuite {
  import SparkTestSession._

  test("closed-left epoch-aligned buckets; min_by picks earliest row") {
    import spark.implicits._
    val t0 = 1722297600000L // whole 5s boundary
    val rows = Seq(
      (new Timestamp(t0), 1.0, "h0"),            // exactly on boundary
      (new Timestamp(t0 + 4999), 3.0, "h1"),     // last ms of bucket 0
      (new Timestamp(t0 + 5000), 10.0, "h2"),    // opens bucket 1
      (new Timestamp(t0 + 7000), 20.0, "h3"))
      .map { case (ts, v, h) => ("dev_2024-07-30", ts, v, h) }
      .toDF("device_date", "ts", "signal", "hash")

    val out = Downsample.tumblingMean(rows, "ts", "5 seconds",
        keys = Seq("device_date"), signals = Seq("signal"),
        firstCols = Seq("hash"))
      .orderBy("bucket_start")
      .collect()

    assert(out.length == 2)
    assert(out(0).getAs[Timestamp]("bucket_start").getTime == t0)
    assert(out(0).getAs[Double]("signal") == 2.0) // mean(1, 3)
    assert(out(0).getAs[String]("hash") == "h0")  // earliest, not arbitrary
    assert(out(1).getAs[Timestamp]("bucket_start").getTime == t0 + 5000)
    assert(out(1).getAs[Double]("signal") == 15.0)
    assert(out(1).getAs[String]("hash") == "h2")
  }

  test("gapFill carries the last observation into empty buckets") {
    import spark.implicits._
    val t0 = 1_722_297_600_000L // 2024-07-30 00:00:00 UTC
    val rows = Seq(
      ("a", new Timestamp(t0), 1.0, 1L),
      ("a", new Timestamp(t0 + 500), 2.0, 2L),   // same bucket: latest wins
      ("a", new Timestamp(t0 + 3000), 9.0, 3L),  // bucket 3; 1-2 are gaps
      ("b", new Timestamp(t0 + 1000), 5.0, 4L))  // single-bucket key
      .toDF("k", "ts", "v", "id")
    val out = Downsample.gapFill(rows, "k", "ts", "v",
        stepUs = 1000000L, tieBreak = Seq("id"))
      .orderBy("k", "bucket_start_us").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))
    val t0us = t0 * 1000
    assert(out.toSeq == Seq(
      ("a", t0us, 2.0, false),            // dedupe kept the later row
      ("a", t0us + 1000000, 2.0, true),   // gap: carried forward
      ("a", t0us + 2000000, 2.0, true),
      ("a", t0us + 3000000, 9.0, false),
      ("b", t0us + 1000000, 5.0, false))) // extent is per-key
  }

  test("ewmaQuantized: exact integer recurrence, per-group isolation") {
    import spark.implicits._
    import graft.operators.Downsample
    // e1 = 10; e2 = (2*20+8*10) div 10 = 12; e3 = (2*30+8*12) div 10 = 15
    val df = Seq(
      ("g1", 1L, 1L, 10L), ("g1", 2L, 2L, 20L), ("g1", 3L, 3L, 30L),
      ("g2", 1L, 4L, 100L), ("g2", 2L, 5L, 0L)
    ).toDF("grp", "ord", "id", "x")
    val out = Downsample.ewmaQuantized(df, Seq("grp"), Seq("ord"), "id",
        col("x"))
      .orderBy("id")
      .select("id", "x_m", "ewma_m").as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      (1L, 10L, 10L), (2L, 20L, 12L), (3L, 30L, 15L),
      (4L, 100L, 100L), (5L, 0L, 80L))) // g2: (2*0+8*100) div 10 = 80
    // partition invariance: the gather-sort-fold is order-independent
    val b = Downsample.ewmaQuantized(df.repartition(7), Seq("grp"),
        Seq("ord"), "id", col("x"))
      .orderBy("id").select("id", "x_m", "ewma_m")
      .as[(Long, Long, Long)].collect()
    assert(b.toSeq == out.toSeq)
    // negative inputs: both engines truncate toward zero (verified:
    // DuckDB -15 // 10 = -1), so the recurrence stays engine-exact
    // below zero; e2 = (2*(-20) + 8*(-10)) div 10 = -120 div 10 = -12,
    // e3 = (2*5 + 8*(-12)) div 10 = -86 div 10 = -8 (truncation!)
    val neg = Seq(("g", 1L, 1L, -10L), ("g", 2L, 2L, -20L),
      ("g", 3L, 3L, 5L)).toDF("grp", "ord", "id", "x")
    val rn = Downsample.ewmaQuantized(neg, Seq("grp"), Seq("ord"), "id",
        col("x"))
      .orderBy("id").select("id", "ewma_m").as[(Long, Long)].collect()
    assert(rn.toSeq == Seq((1L, -10L), (2L, -12L), (3L, -8L)))
  }

}
