package graft

import graft.operators.Quantiles
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantilesSpec extends AnyFunSuite {
  import SparkTestSession._

  private val qs = Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L))

  test("hand fixture: nearest-rank picks on a known histogram; " +
      "NULL values are dropped like percentile()'s") {
    import spark.implicits._
    // group a: values 1..10 (milli buckets 1000..10000) → p50 = value 5,
    // p90 = value 9, p99 = value 10 (nearest-rank: ceil(q·N)); the two
    // NULLs must not shift any rank (r11 review: a NULL bucket sorts
    // NULLS FIRST in Spark's window but NULLS LAST in DuckDB's)
    val df = ((1 to 10).map(v => ("a", Some(v.toDouble))) ++
      Seq(("a", None), ("a", None))).toDF("g", "v")
    val got = Quantiles.histogramQuantiles(df, Seq("g"), col("v"),
      scale = 1000L, quantiles = qs).collect().head
    assert((got.getAs[Long]("p50"), got.getAs[Long]("p90"),
      got.getAs[Long]("p99")) == (5000L, 9000L, 10000L))
  }

  test("within one grid step of the exact nearest-rank value") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val vals = Seq.fill(5000)(rnd.nextDouble() * 500.0)
    val df = vals.map(("g", _)).toDF("g", "v")
    val got = Quantiles.histogramQuantiles(df, Seq("g"), col("v"),
      scale = 1000L, quantiles = qs).collect().head
    val sorted = vals.sorted
    def exact(num: Long, den: Long): Double =
      sorted(((sorted.size * num + den - 1) / den - 1).toInt)
    Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L)).foreach {
      case (c, n, d) =>
        val est = got.getAs[Long](c) / 1000.0
        assert(math.abs(est - exact(n, d)) <= 0.001 + 1e-9,
          s"$c: est $est vs exact ${exact(n, d)}")
    }
  }

  test("shard histograms merge by addition to the whole's quantiles") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val all = Seq.fill(4000)(("g" + rnd.nextInt(3), rnd.nextDouble() * 100))
    val (s1, s2) = all.splitAt(1500)
    val whole = Quantiles.histogramQuantiles(all.toDF("g", "v"), Seq("g"),
        col("v"), 1000L, qs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val merged = Quantiles.quantilesFromHistogram(
        Quantiles.histogram(s1.toDF("g", "v"), Seq("g"), col("v"), 1000L)
          .unionByName(Quantiles.histogram(s2.toDF("g", "v"), Seq("g"),
            col("v"), 1000L))
          .groupBy("g", "bucket").agg(sum("n").as("n")),
        Seq("g"), qs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(whole == merged)
  }

  test("negative values bucket by floor (toward -inf), keeping order") {
    import spark.implicits._
    val df = Seq(("g", -2.5), ("g", -1.0), ("g", 0.5), ("g", 3.0))
      .toDF("g", "v")
    val got = Quantiles.histogramQuantiles(df, Seq("g"), col("v"), 1000L,
      Seq(("p25", 1L, 4L), ("p100", 1L, 1L))).collect().head
    assert(got.getAs[Long]("p25") == -2500L)
    assert(got.getAs[Long]("p100") == 3000L)
  }

  test("histogram is a streaming-aggregable statistic: complete-mode " +
      "snapshot equals the batch histogram and its quantiles") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rnd = new scala.util.Random(21)
    val rows = Seq.fill(2000)(("g" + rnd.nextInt(2), rnd.nextDouble() * 50))
    val input = MemoryStream[(String, Double)]
    val q = Quantiles.histogram(input.toDS().toDF("g", "v"), Seq("g"),
        col("v"), 1000L)
      .writeStream.format("memory").queryName("hist_stream")
      .outputMode("complete").start()
    try {
      val (b1, b2) = rows.splitAt(900)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val snap = spark.table("hist_stream")
      .select(col("g"), col("bucket"), col("n").cast("long"))
      .as[(String, Long, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    val batch = Quantiles.histogram(rows.toDF("g", "v"), Seq("g"),
        col("v"), 1000L)
      .as[(String, Long, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(snap == batch)
    val fromSnap = Quantiles.quantilesFromHistogram(
        spark.table("hist_stream"), Seq("g"), qs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val fromBatch = Quantiles.histogramQuantiles(rows.toDF("g", "v"),
        Seq("g"), col("v"), 1000L, qs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(fromSnap == fromBatch)
  }
}
