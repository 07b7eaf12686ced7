package graft.functions

/** Savitzky-Golay smoothing (Savitzky & Golay 1964, Anal. Chem. 36(8):
  * least-squares polynomial FIR smoothing) — the reference applies scipy's
  * `savgol_filter` per device for ML feature prep
  * (`02.1.3_train_xgboost_model.py:156-158` window 15 poly 3;
  * `STEP 3 - EDA Analysis/database_pipeline.py:402-420`).
  *
  * Interior points are a fixed FIR dot product (precomputed coefficients);
  * edges reproduce scipy's default `mode="interp"`: a polynomial of degree
  * `poly` is least-squares-fit to the first/last `window` samples and
  * evaluated at the edge positions.
  *
  * The kernel is pure array math — at scale it runs inside per-device
  * `flatMapGroups` (SURVEY §2.10), never as a driver loop.
  */
object SavitzkyGolay {

  /** Least-squares FIR coefficients: the smoothed value at the window
    * center is `coeffs · window`. Solves the normal equations of the
    * Vandermonde fit (positions -half..+half, degree `poly`). */
  def coeffs(window: Int, poly: Int): Array[Double] = {
    require(window % 2 == 1, "window must be odd")
    require(poly < window, "poly must be < window")
    val half = window / 2
    // fit at x = 0 → coefficient row = first row of (A^T A)^-1 A^T
    val a = Array.tabulate(window, poly + 1)((i, j) =>
      math.pow((i - half).toDouble, j))
    val atA = Array.tabulate(poly + 1, poly + 1)((r, c) =>
      (0 until window).map(i => a(i)(r) * a(i)(c)).sum)
    val inv = invert(atA)
    // c_i = sum_j inv(0)(j) * A(i)(j)
    Array.tabulate(window)(i =>
      (0 to poly).map(j => inv(0)(j) * a(i)(j)).sum)
  }

  /** Smooth a series with scipy-equivalent `mode="interp"` edges. Series
    * shorter than `window` falls back to a single polynomial fit over the
    * whole series (scipy raises there; a total function suits a data
    * pipeline better — documented deviation). */
  def smooth(y: Array[Double], window: Int, poly: Int): Array[Double] = {
    val n = y.length
    if (n == 0) return y
    if (n < window) return polyFitEval(y, math.min(poly, n - 1))
    val half = window / 2
    val c = coeffs(window, poly)
    val out = new Array[Double](n)
    var i = half
    while (i < n - half) {
      var s = 0.0
      var k = 0
      while (k < window) { s += c(k) * y(i - half + k); k += 1 }
      out(i) = s
      i += 1
    }
    // interp edges: fit degree-`poly` polynomial to the terminal windows
    val headFit = polyCoeffs(y.slice(0, window), poly)
    val tailFit = polyCoeffs(y.slice(n - window, n), poly)
    var e = 0
    while (e < half) {
      out(e) = polyEval(headFit, e.toDouble)
      out(n - 1 - e) = polyEval(tailFit, (window - 1 - e).toDouble)
      e += 1
    }
    out
  }

  /** Least-squares polynomial fit coefficients (ascending powers) over
    * positions 0..m-1. */
  private def polyCoeffs(y: Array[Double], poly: Int): Array[Double] = {
    val m = y.length
    val a = Array.tabulate(m, poly + 1)((i, j) => math.pow(i.toDouble, j))
    val atA = Array.tabulate(poly + 1, poly + 1)((r, c) =>
      (0 until m).map(i => a(i)(r) * a(i)(c)).sum)
    val atY = Array.tabulate(poly + 1)(r =>
      (0 until m).map(i => a(i)(r) * y(i)).sum)
    val inv = invert(atA)
    Array.tabulate(poly + 1)(r =>
      (0 to poly).map(j => inv(r)(j) * atY(j)).sum)
  }

  private def polyFitEval(y: Array[Double], poly: Int): Array[Double] = {
    val cs = polyCoeffs(y, poly)
    Array.tabulate(y.length)(i => polyEval(cs, i.toDouble))
  }

  private def polyEval(cs: Array[Double], x: Double): Double = {
    var s = 0.0
    var i = cs.length - 1
    while (i >= 0) { s = s * x + cs(i); i -= 1 }
    s
  }

  /** Gauss-Jordan inversion for the small (≤ window) normal matrices. */
  private def invert(m: Array[Array[Double]]): Array[Array[Double]] = {
    val n = m.length
    val a = Array.tabulate(n, 2 * n)((r, c) =>
      if (c < n) m(r)(c) else if (c - n == r) 1.0 else 0.0)
    var col = 0
    while (col < n) {
      var piv = col
      var r = col + 1
      while (r < n) {
        if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r
        r += 1
      }
      val tmp = a(col); a(col) = a(piv); a(piv) = tmp
      val d = a(col)(col)
      require(math.abs(d) > 1e-12, "singular normal matrix")
      var c = 0
      while (c < 2 * n) { a(col)(c) /= d; c += 1 }
      r = 0
      while (r < n) {
        if (r != col) {
          val f = a(r)(col)
          c = 0
          while (c < 2 * n) { a(r)(c) -= f * a(col)(c); c += 1 }
        }
        r += 1
      }
      col += 1
    }
    Array.tabulate(n, n)((r, c) => a(r)(c + n))
  }
}
