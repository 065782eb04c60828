package graft.functions

/** Pure-Scala per-series math used inside flatMapGroups (one group = one
  * series; parallelism across groups). Spark-side wiring lives in
  * graft.core.GDataset#regrid / #dft.
  *
  * Re-expresses the reference's `regrid` (polars_dataset.py:204-238,
  * which delegates to the polars_splines plugin) and the README's
  * "Fourier transform" capability with no native plugin: a natural
  * cubic spline (O(n) tridiagonal solve) and a direct DFT.
  */
object Interpolation {

  /** Natural cubic spline through (xs, ys) evaluated at `grid`.
    * xs must be strictly increasing (callers sort + dedupe).
    * Outside [xs.head, xs.last] the end cubic is extrapolated.
    */
  def cubicSpline(xs: Array[Double], ys: Array[Double], grid: Array[Double]): Array[Double] = {
    val n = xs.length
    if (n == 0) return Array.fill(grid.length)(Double.NaN)
    if (n == 1) return Array.fill(grid.length)(ys(0))
    val h = Array.tabulate(n - 1)(i => xs(i + 1) - xs(i))
    // second derivatives, natural boundary (m(0) = m(n-1) = 0), Thomas solve
    val m = new Array[Double](n)
    if (n > 2) {
      val b = new Array[Double](n)
      val c = new Array[Double](n)
      val d = new Array[Double](n)
      var i = 1
      while (i < n - 1) {
        b(i) = 2.0 * (h(i - 1) + h(i))
        c(i) = h(i)
        d(i) = 6.0 * ((ys(i + 1) - ys(i)) / h(i) - (ys(i) - ys(i - 1)) / h(i - 1))
        i += 1
      }
      i = 2
      while (i < n - 1) {
        val f = h(i - 1) / b(i - 1)
        b(i) -= f * c(i - 1)
        d(i) -= f * d(i - 1)
        i += 1
      }
      m(n - 2) = d(n - 2) / b(n - 2)
      i = n - 3
      while (i >= 1) {
        m(i) = (d(i) - c(i) * m(i + 1)) / b(i)
        i -= 1
      }
    }
    grid.map { x =>
      var seg =
        if (x <= xs(0)) 0
        else if (x >= xs(n - 1)) n - 2
        else {
          var l = 0
          var r = n - 2
          while (l < r) {
            val mid = (l + r + 1) >>> 1
            if (xs(mid) <= x) l = mid else r = mid - 1
          }
          l
        }
      val hh = h(seg)
      val a = (xs(seg + 1) - x) / hh
      val b2 = (x - xs(seg)) / hh
      a * ys(seg) + b2 * ys(seg + 1) +
        ((a * a * a - a) * m(seg) + (b2 * b2 * b2 - b2) * m(seg + 1)) * hh * hh / 6.0
    }
  }

  /** Magnitudes of the first `k` DFT bins of a real series. */
  def dftMagnitudes(ys: Array[Double], k: Int): Array[Double] = {
    val n = ys.length
    if (n == 0) return Array.empty
    Array.tabulate(math.min(k, n)) { f =>
      var re = 0.0
      var im = 0.0
      var t = 0
      while (t < n) {
        val ang = -2.0 * math.Pi * f * t / n
        re += ys(t) * math.cos(ang)
        im += ys(t) * math.sin(ang)
        t += 1
      }
      math.sqrt(re * re + im * im)
    }
  }
}
