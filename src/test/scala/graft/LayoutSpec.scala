package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Z-order layout clustering ([[Layout]]): Morton interleave
  * known-answer bits, quantize clamping, and the writer-path property
  * that range-partitioning on z gives disjoint per-file z-ranges
  * (⇒ per-file min/max prune on BOTH interleaved columns).
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def z(x: Long, y: Long, bits: Int = 4): Long =
    Seq((x, y)).toDF("x", "y")
      .select(Layout.mortonZ(col("x"), col("y"), bits).as("z"))
      .head().getLong(0)

  test("mortonZ interleaves bits: x at even, y at odd positions") {
    assert(z(0, 0) == 0L)
    assert(z(1, 0) == 1L)   // x bit 0 -> z bit 0
    assert(z(0, 1) == 2L)   // y bit 0 -> z bit 1
    assert(z(3, 1) == 7L)   // 0b11 x 0b01 -> 0b0111
    assert(z(0, 3) == 10L)  // 0b00 x 0b11 -> 0b1010
    assert(z(15, 15) == 255L)
    // SQL twin generates the identical value
    val sqlZ = spark.sql(
      s"SELECT ${Layout.mortonZSql("3", "1", 4)} AS z")
      .head().getAs[Number]("z").longValue()
    assert(sqlZ == 7L)
  }

  test("mortonZN generalizes: n=2 equals mortonZ; 3-dim round-robin") {
    val df = Seq((5L, 9L, 3L)).toDF("x", "y", "w")
    val z2 = df.select(Layout.mortonZN(Seq(col("x"), col("y")), 4).as("a"),
      Layout.mortonZ(col("x"), col("y"), 4).as("b")).head()
    assert(z2.getLong(0) == z2.getLong(1))
    // 3 dims, 2 bits: x=0b01, y=0b11, w=0b10 ->
    // bit layout (i*3+d): x0@0=1, y0@1=1, w0@2=0, x1@3=0, y1@4=1, w1@5=1
    val z3 = Seq((1L, 3L, 2L)).toDF("x", "y", "w")
      .select(Layout.mortonZN(Seq(col("x"), col("y"), col("w")), 2).as("z"))
      .head().getLong(0)
    assert(z3 == 0x33L, s"got $z3")
    val sqlZ3 = spark.sql(
      s"SELECT ${Layout.mortonZNSql(Seq("1", "3", "2"), 2)} AS z")
      .head().getAs[Number]("z").longValue()
    assert(sqlZ3 == z3)
  }

  test("quantize clamps to [0, 2^bits) and is monotone") {
    val df = Seq(-1.0, 0.0, 0.5, 0.999, 1.0, 2.0).toDF("v")
      .select(Layout.quantize(col("v"), 0.0, 1.0, 8).as("q"))
    assert(df.as[Long].collect().toSeq == Seq(0L, 0L, 128L, 255L, 255L, 255L))
  }

  test("clusterByZ: per-partition z-ranges are disjoint (file pruning)") {
    val pts = (0 until 4096).map { i =>
      (i.toLong % 64 / 64.0, i.toLong / 64 / 64.0)
    }.toDF("x", "y")
    val zc = Layout.mortonZ(Layout.quantize(col("x"), 0.0, 1.0, 8),
      Layout.quantize(col("y"), 0.0, 1.0, 8), 8)
    val ranges = Layout.clusterByZ(pts, zc, 8)
      .select(spark_partition_id().as("p"), col("_z"))
      .groupBy("p").agg(min("_z").as("lo"), max("_z").as("hi"))
      .orderBy("lo")
      .select("lo", "hi").as[(Long, Long)].collect()
    assert(ranges.length > 1)
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, s"overlapping z-ranges: $hi1 > $lo2")
    }
    // the pruning payoff, on EXACT fixed-width buckets (range
    // partitioning above samples boundaries, so straddling partitions
    // can momentarily span a quad edge — the exact-bucket grain is the
    // deterministic statement of the same property): bits=8 makes z
    // 16 bits, so z >> 6 buckets are 64-z-value = 8x8 quantized-cell
    // blocks = 2x2 blocks of the 64x64 data grid — BOTH axes span
    // exactly 1/64 of the global extent, where a 1-D sort would leave
    // one axis unbounded
    val bx = Layout.zorderStats(pts, col("x"), col("y"),
        0.0, 1.0, 0.0, 1.0, bits = 8, bucketShift = 6)
      .select("min_lon_micro", "max_lon_micro", "min_lat_micro",
        "max_lat_micro").as[(Long, Long, Long, Long)].collect()
    assert(bx.length == 1024)
    bx.foreach { case (xlo, xhi, ylo, yhi) =>
      assert(xhi - xlo <= 15625 && yhi - ylo <= 15625)
    }
  }
}
