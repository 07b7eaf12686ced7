package graft

import java.sql.Timestamp

import graft.operators.Downsample
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
}
