package graft

import graft.functions.SavitzkyGolay
import org.scalatest.funsuite.AnyFunSuite

class SavitzkyGolaySpec extends AnyFunSuite {

  test("window-5 poly-2 coefficients match the published values") {
    // Savitzky & Golay 1964 table: [-3, 12, 17, 12, -3] / 35
    val c = SavitzkyGolay.coeffs(5, 2)
    val want = Array(-3.0, 12.0, 17.0, 12.0, -3.0).map(_ / 35.0)
    c.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
    assert(math.abs(c.sum - 1.0) < 1e-12)
  }

  test("reproduces polynomials of degree <= poly exactly, including edges") {
    // a cubic through a 15/3 filter must be invariant (interp edge mode)
    val y = Array.tabulate(60)(i => 0.5 * i * i * i - 3 * i * i + 7 * i - 2.0)
    val s = SavitzkyGolay.smooth(y, 15, 3)
    y.zip(s).zipWithIndex.foreach { case ((a, b), i) =>
      assert(math.abs(a - b) <= 1e-6 * (1 + a.abs), s"idx $i: $a vs $b")
    }
  }

  test("attenuates noise on a smooth signal") {
    val rnd = new scala.util.Random(3)
    val clean = Array.tabulate(500)(i => math.sin(i / 25.0) * 10)
    val noisy = clean.map(_ + rnd.nextGaussian())
    val sm = SavitzkyGolay.smooth(noisy, 15, 3)
    def mse(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum / a.length
    assert(mse(sm, clean) < mse(noisy, clean) / 2)
  }

  test("short series falls back to a total polynomial fit") {
    val y = Array(1.0, 2.0, 3.0)
    val s = SavitzkyGolay.smooth(y, 15, 3)
    y.zip(s).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }
}
