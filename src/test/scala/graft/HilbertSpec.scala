package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Hilbert kernel's independent legs (the oracle expression is
  * GENERATED from the same steps, so these known-answer/property
  * checks are the non-circular evidence — the WebClean/Layout/LangId
  * convention): a literal JVM transcription of the published xy2d
  * pseudocode, the canonical bits=1 U order, full-grid bijectivity,
  * and the defining ADJACENCY property (consecutive curve positions
  * are grid neighbors) that Morton provably violates on the same
  * grid. */
class HilbertSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Literal transcription of the classic xy2d conversion (Hilbert
    * curve via reflect/swap, e.g. Wikipedia "Hilbert curve" C code). */
  private def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("bits=1 quadrant order is the canonical U: (0,0)(0,1)(1,1)(1,0)") {
    assert(Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L))
      .map { case (x, y) => xy2d(1, x, y) } == Seq(0L, 1L, 2L, 3L))
  }

  test("Column kernel == reference on the full 3-bit grid; bijective; " +
      "consecutive positions are neighbors (Morton is not)") {
    import spark.implicits._
    val bits = 3
    val n = 1 << bits
    val cells = for { x <- 0 until n; y <- 0 until n }
      yield (x.toLong, y.toLong)
    val got = cells.toDF("x", "y")
      .withColumn("d", Layout.hilbertD(col("x"), col("y"), bits))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    cells.foreach { case (x, y) =>
      assert(got((x, y)) == xy2d(bits, x, y), s"cell ($x,$y)")
    }
    assert(got.values.toSet == (0L until n.toLong * n).toSet,
      "curve positions must be a bijection onto [0, 4^bits)")
    val byD = got.toSeq.map(_.swap).sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert((x1 - x2).abs + (y1 - y2).abs == 1,
        s"non-adjacent curve step ($x1,$y1)->($x2,$y2)")
    case _ => () }
    // Morton on the same grid takes diagonal/far jumps — the property
    // that makes Hilbert the tighter clustering curve
    val mort = cells.toDF("x", "y")
      .withColumn("d", Layout.mortonZ(col("x"), col("y"), bits))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val mByD = mort.toSeq.map(_.swap).sortBy(_._1).map(_._2)
    assert(mByD.sliding(2).exists { case Seq((x1, y1), (x2, y2)) =>
      (x1 - x2).abs + (y1 - y2).abs > 1
    case _ => false })
  }

  test("16-bit kernel matches the reference on random coordinates") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pts = (1 to 200).map(_ =>
      (rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got = pts.toDF("x", "y")
      .withColumn("d", Layout.hilbertD(col("x"), col("y"), 16))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == xy2d(16, x, y), s"cell ($x,$y)")
    }
  }
}
