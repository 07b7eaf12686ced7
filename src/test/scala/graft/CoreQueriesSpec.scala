package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class CoreQueriesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("every declared query runs and oracle coverage is complete") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    // every oracle entry refers to a declared query
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      df.count() // must execute
    }
  }

  test("q1_agg groups to the 6 returnflag/linestatus combos with positive sums") {
    val rows = SparkEntry.queries("q1_agg")(spark, sf).collect()
    assert(rows.length >= 3)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
    }
  }

  test("q_hash_id produces 64-char lowercase hex, unique per event") {
    val df = SparkEntry.queries("q_hash_id")(spark, sf)
    val n = df.count()
    assert(df.select("row_hash").distinct().count() == n)
    val h = df.head().getAs[String]("row_hash")
    assert(h.matches("[0-9a-f]{64}"))
  }

  test("q_gaps_islands dwell time is non-negative and resets across blocks") {
    val rows = SparkEntry.queries("q_gaps_islands")(spark, sf).collect()
    assert(rows.forall(_.getAs[Double]("dwell_s") >= 0.0))
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
