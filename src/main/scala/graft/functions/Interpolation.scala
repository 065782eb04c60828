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
/** Spline knobs — the Spark-side analog of the reference's `**kwargs`
  * pass-through to its spline plugin (polars_dataset.py:212; the build
  * artifact also exposes scipy's PchipInterpolator,
  * build/lib/polars_dataset.py:8,304).
  *
  * @param kind        "cubic" (C² natural/clamped spline), "pchip"
  *                    (Fritsch–Carlson monotone cubic Hermite: shape-
  *                    preserving, no overshoot between knots — the
  *                    right default for physical series with plateaus),
  *                    or "linear" (piecewise-linear between knots —
  *                    scipy interp1d kind="linear"; the one kind a SQL
  *                    oracle can replay exactly, so its regrid query is
  *                    hash-verified end to end where the cubic kinds
  *                    are rows-only)
  * @param boundary    "natural" (zero second derivative at the ends) or
  *                    "clamped" (first derivatives pinned to
  *                    `derivStart`/`derivEnd`; exact for cubics when the
  *                    true end slopes are supplied). Cubic kind only —
  *                    pchip derives its end slopes from the data.
  * @param derivStart  end slope at xs.head (clamped only)
  * @param derivEnd    end slope at xs.last (clamped only)
  * @param extrapolate outside [xs.head, xs.last]: "cubic" extends the
  *                    end segment's cubic, "constant" holds the end
  *                    value, "none" yields NaN (dropped downstream like
  *                    any other NaN via drop_nan)
  */
final case class SplineOptions(
    boundary: String = "natural",
    derivStart: Double = 0.0,
    derivEnd: Double = 0.0,
    extrapolate: String = "cubic",
    kind: String = "cubic") {
  require(Seq("cubic", "pchip", "linear").contains(kind),
    s"unknown spline kind `$kind`")
  require(Seq("natural", "clamped").contains(boundary),
    s"unknown spline boundary `$boundary`")
  require(Seq("cubic", "constant", "none").contains(extrapolate),
    s"unknown spline extrapolation `$extrapolate`")
}

object Interpolation {

  /** Natural cubic spline through (xs, ys) evaluated at `grid`.
    * xs must be strictly increasing (callers sort + dedupe).
    * Outside [xs.head, xs.last] the end cubic is extrapolated.
    */
  def cubicSpline(xs: Array[Double], ys: Array[Double], grid: Array[Double]): Array[Double] =
    cubicSpline(xs, ys, grid, SplineOptions())

  /** Cubic spline with boundary/extrapolation options ([[SplineOptions]]).
    * One tridiagonal (Thomas) solve either way: the boundary choice only
    * changes the first and last rows of the system. */
  def cubicSpline(
      xs: Array[Double],
      ys: Array[Double],
      grid: Array[Double],
      opts: SplineOptions): Array[Double] = {
    val n = xs.length
    if (n == 0) return Array.fill(grid.length)(Double.NaN)
    if (n == 1) return grid.map { x =>
      if (opts.extrapolate == "none" && x != xs(0)) Double.NaN else ys(0)
    }
    if (opts.kind == "pchip") return pchip(xs, ys, grid, opts)
    if (opts.kind == "linear") return linear(xs, ys, grid, opts)
    val h = Array.tabulate(n - 1)(i => xs(i + 1) - xs(i))
    // second derivatives m via Thomas solve of the full n×n tridiagonal
    // system; rows 1..n-2 are the standard continuity equations, rows 0
    // and n-1 encode the boundary condition
    val a = new Array[Double](n) // sub-diagonal
    val b = new Array[Double](n) // diagonal
    val c = new Array[Double](n) // super-diagonal
    val d = new Array[Double](n) // rhs
    if (opts.boundary == "clamped") {
      b(0) = 2.0 * h(0); c(0) = h(0)
      d(0) = 6.0 * ((ys(1) - ys(0)) / h(0) - opts.derivStart)
      a(n - 1) = h(n - 2); b(n - 1) = 2.0 * h(n - 2)
      d(n - 1) = 6.0 * (opts.derivEnd - (ys(n - 1) - ys(n - 2)) / h(n - 2))
    } else { // natural: m(0) = m(n-1) = 0
      b(0) = 1.0; b(n - 1) = 1.0
    }
    var i = 1
    while (i < n - 1) {
      a(i) = h(i - 1)
      b(i) = 2.0 * (h(i - 1) + h(i))
      c(i) = h(i)
      d(i) = 6.0 * ((ys(i + 1) - ys(i)) / h(i) - (ys(i) - ys(i - 1)) / h(i - 1))
      i += 1
    }
    i = 1
    while (i < n) {
      val f = a(i) / b(i - 1)
      b(i) -= f * c(i - 1)
      d(i) -= f * d(i - 1)
      i += 1
    }
    val m = new Array[Double](n)
    m(n - 1) = d(n - 1) / b(n - 1)
    i = n - 2
    while (i >= 0) {
      m(i) = (d(i) - c(i) * m(i + 1)) / b(i)
      i -= 1
    }
    grid.map { x =>
      val below = x < xs(0)
      val above = x > xs(n - 1)
      if ((below || above) && opts.extrapolate == "none") Double.NaN
      else if (below && opts.extrapolate == "constant") ys(0)
      else if (above && opts.extrapolate == "constant") ys(n - 1)
      else {
        val seg =
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
        val aa = (xs(seg + 1) - x) / hh
        val b2 = (x - xs(seg)) / hh
        aa * ys(seg) + b2 * ys(seg + 1) +
          ((aa * aa * aa - aa) * m(seg) + (b2 * b2 * b2 - b2) * m(seg + 1)) * hh * hh / 6.0
      }
    }
  }

  /** Piecewise-linear interpolation (scipy interp1d kind="linear").
    * The evaluation is written EXACTLY as the SQL oracle writes it —
    * `y0 + (y1 - y0) * ((x - x0) / (x1 - x0))`, ratio parenthesized
    * first — so both engines run the identical IEEE-754 expression and
    * the 6dp-rounded outputs hash equal (same convention as the
    * q_interpolate oracle). Outside [xs.head, xs.last]: "constant"
    * holds the end value, "none" yields NaN, and the default "cubic"
    * mode extends the END SEGMENT'S LINE (the linear kind's analog of
    * extending the end cubic). */
  private def linear(
      xs: Array[Double],
      ys: Array[Double],
      grid: Array[Double],
      opts: SplineOptions): Array[Double] = {
    val n = xs.length
    grid.map { x =>
      val below = x < xs(0)
      val above = x > xs(n - 1)
      if ((below || above) && opts.extrapolate == "none") Double.NaN
      else if (below && opts.extrapolate == "constant") ys(0)
      else if (above && opts.extrapolate == "constant") ys(n - 1)
      else {
        val seg =
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
        ys(seg) + (ys(seg + 1) - ys(seg)) * ((x - xs(seg)) / (xs(seg + 1) - xs(seg)))
      }
    }
  }

  /** PCHIP — monotone cubic Hermite with Fritsch–Carlson tangents
    * (scipy PchipInterpolator semantics; see the reference build
    * artifact's import, build/lib/polars_dataset.py:8). Interior
    * tangents are the weighted harmonic mean of adjacent secant
    * slopes, zero whenever the slopes change sign or either is zero —
    * which is exactly the condition that pins the interpolant inside
    * the data's local range: monotone data stays monotone and a step
    * never rings, where the C² spline overshoots. Endpoint slopes use
    * the standard one-sided three-point formula with the monotonicity
    * clamps. Callers guarantee xs strictly increasing. */
  private def pchip(
      xs: Array[Double],
      ys: Array[Double],
      grid: Array[Double],
      opts: SplineOptions): Array[Double] = {
    val n = xs.length
    val h = Array.tabulate(n - 1)(i => xs(i + 1) - xs(i))
    val delta = Array.tabulate(n - 1)(i => (ys(i + 1) - ys(i)) / h(i))
    val d = new Array[Double](n)
    if (n == 2) { d(0) = delta(0); d(1) = delta(0) }
    else {
      var i = 1
      while (i < n - 1) {
        d(i) =
          if (delta(i - 1) == 0.0 || delta(i) == 0.0 ||
              math.signum(delta(i - 1)) != math.signum(delta(i))) 0.0
          else {
            val w1 = 2.0 * h(i) + h(i - 1)
            val w2 = h(i) + 2.0 * h(i - 1)
            (w1 + w2) / (w1 / delta(i - 1) + w2 / delta(i))
          }
        i += 1
      }
      def endSlope(h0: Double, h1: Double, d0: Double, d1: Double): Double = {
        var s = ((2.0 * h0 + h1) * d0 - h0 * d1) / (h0 + h1)
        if (math.signum(s) != math.signum(d0)) s = 0.0
        else if (math.signum(d0) != math.signum(d1) && math.abs(s) > 3.0 * math.abs(d0))
          s = 3.0 * d0
        s
      }
      d(0) = endSlope(h(0), h(1), delta(0), delta(1))
      d(n - 1) = endSlope(h(n - 2), h(n - 3), delta(n - 2), delta(n - 3))
    }
    grid.map { x =>
      val below = x < xs(0)
      val above = x > xs(n - 1)
      if ((below || above) && opts.extrapolate == "none") Double.NaN
      else if (below && opts.extrapolate == "constant") ys(0)
      else if (above && opts.extrapolate == "constant") ys(n - 1)
      else {
        val seg =
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
        val t = (x - xs(seg)) / hh
        val t2 = t * t
        val t3 = t2 * t
        (2.0 * t3 - 3.0 * t2 + 1.0) * ys(seg) +
          (t3 - 2.0 * t2 + t) * hh * d(seg) +
          (-2.0 * t3 + 3.0 * t2) * ys(seg + 1) +
          (t3 - t2) * hh * d(seg + 1)
      }
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
