package graft

import org.apache.spark.sql.functions._
import graft.core.GDataset
import graft.functions.Interpolation

class InterpolationSpec extends SparkSpec {

  test("cubic spline reproduces a cubic polynomial near-exactly inside the knots") {
    // natural spline is exact for linear data; close for smooth data
    val xs = (0 to 20).map(_.toDouble).toArray
    val f = (x: Double) => 2.0 * x + 1.0
    val ys = xs.map(f)
    val grid = Array(0.5, 5.25, 10.1, 19.9)
    val got = Interpolation.cubicSpline(xs, ys, grid)
    grid.zip(got).foreach { case (x, y) => assert(math.abs(y - f(x)) < 1e-9, s"at $x: $y") }
  }

  test("cubic spline interpolates sin within tolerance") {
    val xs = (0 to 50).map(i => i * 0.2).toArray
    val ys = xs.map(math.sin)
    val grid = Array(1.1, 2.55, 5.03, 9.41)
    val got = Interpolation.cubicSpline(xs, ys, grid)
    grid.zip(got).foreach { case (x, y) => assert(math.abs(y - math.sin(x)) < 1e-4) }
  }

  test("clamped boundary reproduces a parabola exactly where natural cannot") {
    import graft.functions.SplineOptions
    // x² has nonzero curvature at the ends: the natural condition
    // (m=0 there) is wrong, the clamped condition with the true end
    // slopes (0 and 2·xmax) makes the spline exact — the C2 piecewise
    // cubic interpolant with exact end slopes is unique, and x² is one
    val xs = (0 to 10).map(_.toDouble).toArray
    val ys = xs.map(x => x * x)
    val grid = Array(0.25, 4.5, 9.75)
    val clamped = Interpolation.cubicSpline(xs, ys, grid,
      SplineOptions(boundary = "clamped", derivStart = 0.0, derivEnd = 20.0))
    grid.zip(clamped).foreach { case (x, y) =>
      assert(math.abs(y - x * x) < 1e-9, s"clamped at $x: $y") }
    val natural = Interpolation.cubicSpline(xs, ys, grid)
    assert(math.abs(natural(0) - grid(0) * grid(0)) > 1e-4,
      "natural boundary unexpectedly exact at the edge — clamped adds nothing")
  }

  test("pchip is monotone on a step where the C2 spline overshoots") {
    import graft.functions.SplineOptions
    // a plateau-step-plateau series: the shape-preserving contract is
    // (a) every interpolated value stays inside [0, 1] and (b) values
    // never decrease along x — the natural cubic rings on both counts
    val xs = Array(0.0, 1.0, 2.0, 3.0, 4.0, 5.0)
    val ys = Array(0.0, 0.0, 0.0, 1.0, 1.0, 1.0)
    val grid = (0 to 500).map(_ * 0.01).toArray
    val p = Interpolation.cubicSpline(xs, ys, grid, SplineOptions(kind = "pchip"))
    assert(p.forall(y => y >= -1e-12 && y <= 1.0 + 1e-12),
      s"pchip overshot the data range: min=${p.min} max=${p.max}")
    p.sliding(2).foreach { case Array(a, b) =>
      assert(b >= a - 1e-12, "pchip lost monotonicity") }
    val c = Interpolation.cubicSpline(xs, ys, grid)
    assert(c.min < -1e-3 || c.max > 1.0 + 1e-3,
      "natural spline unexpectedly monotone here — the pchip test proves nothing")
  }

  test("pchip hits every knot and is exact for linear data") {
    import graft.functions.SplineOptions
    val xs = Array(0.0, 0.5, 2.0, 3.5, 7.0)
    val ys = Array(1.0, 3.0, 2.0, 2.0, -4.0)
    val atKnots = Interpolation.cubicSpline(xs, ys, xs, SplineOptions(kind = "pchip"))
    xs.indices.foreach(i => assert(math.abs(atKnots(i) - ys(i)) < 1e-12))
    // harmonic-mean tangents reproduce a straight line exactly,
    // including the two-point degenerate case
    val lin = (x: Double) => -0.5 * x + 3.0
    val lxs = Array(0.0, 1.0, 2.5, 4.0)
    val got = Interpolation.cubicSpline(lxs, lxs.map(lin),
      Array(0.3, 1.7, 3.9), SplineOptions(kind = "pchip"))
    Array(0.3, 1.7, 3.9).zip(got).foreach { case (x, y) =>
      assert(math.abs(y - lin(x)) < 1e-12, s"at $x: $y") }
    val two = Interpolation.cubicSpline(Array(0.0, 2.0), Array(1.0, 5.0),
      Array(0.5, 1.5), SplineOptions(kind = "pchip"))
    assert(math.abs(two(0) - 2.0) < 1e-12 && math.abs(two(1) - 4.0) < 1e-12)
  }

  test("pchip extrapolation modes mirror the cubic kind's") {
    import graft.functions.SplineOptions
    val xs = Array(0.0, 1.0, 2.0)
    val ys = Array(0.0, 1.0, 4.0)
    val g = Array(-1.0, 3.0)
    val const = Interpolation.cubicSpline(xs, ys, g,
      SplineOptions(kind = "pchip", extrapolate = "constant"))
    assert(const(0) == 0.0 && const(1) == 4.0)
    val none = Interpolation.cubicSpline(xs, ys, g,
      SplineOptions(kind = "pchip", extrapolate = "none"))
    assert(none.forall(_.isNaN))
  }

  test("linear kind: exact at knots, exact segment midpoints, all extrapolation modes") {
    import graft.functions.SplineOptions
    val xs = Array(0.0, 1.0, 3.0, 4.0)
    val ys = Array(2.0, 4.0, -2.0, 0.0)
    val lin = SplineOptions(kind = "linear")
    // knots reproduced exactly (ratio is exactly 0 at a knot)
    val atKnots = Interpolation.cubicSpline(xs, ys, xs, lin)
    xs.indices.foreach(i => assert(atKnots(i) == ys(i), s"knot $i"))
    // interior: straight-line values, written as the oracle writes them
    val mid = Interpolation.cubicSpline(xs, ys, Array(0.5, 2.0, 3.25), lin)
    assert(mid(0) == 3.0 && mid(1) == 1.0 && mid(2) == -1.5)
    // extrapolation: default extends the end segment's LINE,
    // constant clamps, none yields NaN
    val g = Array(-1.0, 5.0)
    val ext = Interpolation.cubicSpline(xs, ys, g, lin)
    assert(ext(0) == 0.0 && ext(1) == 2.0)
    val const = Interpolation.cubicSpline(xs, ys, g,
      SplineOptions(kind = "linear", extrapolate = "constant"))
    assert(const(0) == 2.0 && const(1) == 0.0)
    val none = Interpolation.cubicSpline(xs, ys, g,
      SplineOptions(kind = "linear", extrapolate = "none"))
    assert(none.forall(_.isNaN))
    // single observation: constant everywhere (shared n==1 path)
    val one = Interpolation.cubicSpline(Array(1.0), Array(7.0), g,
      SplineOptions(kind = "linear", extrapolate = "constant"))
    assert(one.forall(_ == 7.0))
  }

  test("extrapolation modes: cubic extends, constant holds, none yields NaN") {
    import graft.functions.SplineOptions
    val xs = Array(0.0, 1.0, 2.0, 3.0)
    val ys = xs.map(2.0 * _) // linear: natural spline is the line itself
    val grid = Array(-1.0, 1.5, 4.0)
    val cubic = Interpolation.cubicSpline(xs, ys, grid)
    assert(math.abs(cubic(0) - -2.0) < 1e-9 && math.abs(cubic(2) - 8.0) < 1e-9)
    val const = Interpolation.cubicSpline(xs, ys, grid, SplineOptions(extrapolate = "constant"))
    assert(const(0) == 0.0 && math.abs(const(1) - 3.0) < 1e-9 && const(2) == 6.0)
    val none = Interpolation.cubicSpline(xs, ys, grid, SplineOptions(extrapolate = "none"))
    assert(none(0).isNaN && math.abs(none(1) - 3.0) < 1e-9 && none(2).isNaN)
  }

  test("GDataset.regrid threads spline options to every group") {
    import spark.implicits._
    import graft.functions.SplineOptions
    val df = (for { g <- Seq("a", "b"); i <- 0 to 4 }
      yield (g, i.toDouble, i * 3.0)).toDF("g", "x", "y")
    val out = GDataset(df, "x", Seq("g"))
      .regrid(Array(-1.0, 2.0), SplineOptions(extrapolate = "none"))
      .df.orderBy("g", "x").collect()
    assert(out.length == 4)
    out.foreach { r =>
      val (x, y) = (r.getDouble(1), r.getDouble(2))
      if (x < 0) assert(y.isNaN, s"outside-domain point not NaN at $x")
      else assert(math.abs(y - x * 3.0) < 1e-9)
    }
  }

  test("GDataset.regrid with kind=pchip is monotone per group on step data") {
    import spark.implicits._
    import graft.functions.SplineOptions
    // the public wrapper path: each group is a plateau-step series;
    // the resampled values must stay monotone and inside [0, 1] —
    // the same contract the kernel spec pins, now through regrid
    val df = (for { g <- Seq("a", "b"); i <- 0 to 5 }
      yield (g, i.toDouble, if (i < 3) 0.0 else 1.0)).toDF("g", "x", "y")
    val grid = (0 to 50).map(_ * 0.1).toArray
    val out = GDataset(df, "x", Seq("g"))
      .regrid(grid, SplineOptions(kind = "pchip"))
      .df.orderBy("g", "x").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(out.length == 2 * grid.length)
    out.groupBy(_._1).values.foreach { rows =>
      val ys = rows.sortBy(_._2).map(_._3)
      assert(ys.forall(y => y >= -1e-9 && y <= 1.0 + 1e-9), "overshoot through regrid")
      ys.sliding(2).foreach { case Array(a, b) => assert(b >= a - 1e-9) }
    }
  }

  test("spline handles tiny groups") {
    assert(Interpolation.cubicSpline(Array(1.0), Array(5.0), Array(0.0, 2.0)).toSeq == Seq(5.0, 5.0))
    val two = Interpolation.cubicSpline(Array(0.0, 2.0), Array(0.0, 4.0), Array(1.0))
    assert(math.abs(two(0) - 2.0) < 1e-12) // linear between two points
  }

  test("dft magnitudes detect a pure tone") {
    val n = 64
    val ys = Array.tabulate(n)(t => math.cos(2 * math.Pi * 5 * t / n))
    val mags = Interpolation.dftMagnitudes(ys, 16)
    assert(math.abs(mags(5) - n / 2.0) < 1e-9)
    (0 until 16).filter(_ != 5).foreach(b => assert(mags(b) < 1e-9))
  }

  test("GDataset.regrid resamples per group onto the grid") {
    import spark.implicits._
    val df = (for {
      g <- Seq("a", "b")
      i <- 0 to 10
    } yield (g, i.toDouble, i * 2.0 + (if (g == "a") 0 else 100))).toDF("g", "x", "y")
    val grid = Array(0.5, 5.5, 9.5)
    val out = GDataset(df, "x", Seq("g")).regrid(grid)
    assert(out.df.count() == 2 * grid.length)
    val a5 = out.df.filter(col("g") === "a" && col("x") === 5.5).head().getDouble(2)
    assert(math.abs(a5 - 11.0) < 1e-9)
  }

  test("GDataset.regrid splines struct fields via unnest/rebuild round-trip") {
    import spark.implicits._
    // two linear signals packed in a struct: spline must reproduce them
    val rows = (0 until 12).map(i => (1L, i.toDouble, i * 2.0, 100.0 - i))
    val ds = graft.core.GDataset(
      rows.toDF("k", "x", "a", "b")
        .select(col("k"), col("x"), struct(col("a"), col("b")).as("sig")),
      "x", Seq("k"))
    val grid = Array(2.5, 7.5)
    val out = ds.regrid(grid).df.orderBy("x").collect()
    assert(out.length == 2)
    val s0 = out(0).getStruct(out(0).fieldIndex("sig"))
    assert(math.abs(s0.getDouble(0) - 5.0) < 1e-6)  // a = 2x at 2.5
    assert(math.abs(s0.getDouble(1) - 97.5) < 1e-6) // b = 100-x at 2.5
    assert(ds.regrid(grid).df.schema("sig").dataType.typeName == "struct")
  }

  test("GDataset.ewm recurrence matches the weighted-sum definition") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = for (k <- Seq(1L, 2L); i <- 0 until 50)
      yield (k, i.toDouble, rnd.nextDouble() * 10)
    val out = GDataset(rows.toDF("k", "x", "v"), "x", Seq("k"))
      .ewm(alpha = 0.1).df
      .collect().map(r => (r.getLong(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    // reference: direct weighted sums per point
    val byKey = rows.groupBy(_._1)
    byKey.foreach { case (k, series) =>
      val vs = series.sortBy(_._2).map(_._3)
      vs.indices.foreach { t =>
        val ws = (0 to t).map(i => math.pow(0.9, t - i))
        val expect = ws.zip(vs.take(t + 1)).map { case (w, v) => w * v }.sum / ws.sum
        val got = out((k, t.toDouble))
        assert(math.abs(got - expect) < 1e-9, s"key $k t=$t: $got vs $expect")
      }
    }
  }

  test("ewm is row-wise: duplicate index rows all contribute, nulls are skipped") {
    import spark.implicits._
    val df = Seq(
      (1L, 1.0, Option(10.0)), (1L, 1.0, Option(20.0)), // duplicate x
      (1L, 2.0, Option.empty[Double]),                   // null observation
      (1L, 3.0, Option(30.0))
    ).toDF("k", "x", "v")
    // one group = one partition: collect preserves the emission order
    val out = GDataset(df, "x", Seq("k")).ewm(alpha = 0.5)
      .df.collect().map(_.getDouble(2))
    assert(out.length == 4, "a duplicate-index row was dropped")
    assert(math.abs(out(0) - 10.0) < 1e-12)
    assert(math.abs(out(1) - (20 + 0.5 * 10) / 1.5) < 1e-12) // both x=1 rows count
    assert(out(2) == out(1), "null must carry the previous mean, not poison it")
    assert(math.abs(out(3) - (30 + 0.5 * out(1) * 1.5) / (1 + 0.5 * 1.5)) < 1e-12)
  }

  test("ewmStd/ewmVar recurrence matches the pandas-pinned values") {
    import spark.implicits._
    // pandas Series([1,2,3,4]).ewm(alpha=0.5).std() / .var() references
    val df = Seq((1L, 0.0, 1.0), (1L, 1.0, 2.0), (1L, 2.0, 3.0), (1L, 3.0, 4.0))
      .toDF("k", "x", "v")
    val ds = GDataset(df, "x", Seq("k"))
    val stds = ds.ewmStd(alpha = 0.5).df.orderBy("x")
      .collect().map(_.getDouble(2))
    assert(stds(0).isNaN, "first unbiased std must be NaN (ddof=1)")
    val expectStd = Seq(0.7071067811865476, 0.9636241116594314, 1.1771636613972951)
    stds.drop(1).zip(expectStd).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-12, s"$g vs $e") }
    val varsB = ds.ewmVar(alpha = 0.5, bias = true).df.orderBy("x")
      .collect().map(_.getDouble(2))
    val expectVarB = Seq(0.0, 0.2222222222222222, 0.5306122448979591, 0.8622222222222223)
    varsB.zip(expectVarB).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-12, s"$g vs $e") }
    // constant series: exactly zero variance (clamped), never negative
    val const = Seq((1L, 0.0, 5.0), (1L, 1.0, 5.0), (1L, 2.0, 5.0)).toDF("k", "x", "v")
    val cv = GDataset(const, "x", Seq("k")).ewmVar(alpha = 0.3).df.orderBy("x")
      .collect().map(_.getDouble(2))
    assert(cv(0).isNaN && cv(1) == 0.0 && cv(2) == 0.0)
  }

  test("ewmMeanBy decays by elapsed index distance, both adjust modes") {
    import spark.implicits._
    // irregular spacing: x = 0, 1, 3 with half-life 1
    val df = Seq((1L, 0.0, 1.0), (1L, 1.0, 2.0), (1L, 3.0, 3.0)).toDF("k", "x", "v")
    val ds = GDataset(df, "x", Seq("k"))
    val adj = ds.ewmMeanBy(halfLife = 1.0).df.orderBy("x")
      .collect().map(_.getDouble(2))
    // closed form at x=3: (0.125·1 + 0.25·2 + 1·3) / 1.375
    val expectAdj = Seq(1.0, 2.5 / 1.5, 3.625 / 1.375)
    adj.zip(expectAdj).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-12, s"$g vs $e") }
    val rec = ds.ewmMeanBy(halfLife = 1.0, adjust = false).df.orderBy("x")
      .collect().map(_.getDouble(2))
    val expectRec = Seq(1.0, 1.5, 2.625) // y = (1-0.5^Δ)·x + 0.5^Δ·y
    rec.zip(expectRec).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-12, s"$g vs $e") }
    // a null value: weights don't advance, the prior mean carries
    val withNull = Seq((1L, 0.0, Some(1.0)), (1L, 1.0, None), (1L, 2.0, Some(2.0)))
      .toDF("k", "x", "v")
    val nv = GDataset(withNull, "x", Seq("k")).ewmMeanBy(halfLife = 1.0).df
      .orderBy("x").collect().map(_.getDouble(2))
    assert(nv(1) == 1.0, "null row carries the prior mean")
    assert(math.abs(nv(2) - 2.25 / 1.25) < 1e-12, "decay spans the skipped row")
  }

  test("events (user_id, ts) is unique — the q_dft oracle precondition") {
    // GDataset.dft collapses duplicate index values per group (keeps the
    // last observation) while the DuckDB trig-sum oracle enumerates all
    // rows; a duplicate ts would silently desync the two series, so the
    // data invariant the oracle relies on is pinned here.
    val ev = Tables.t(spark, Sf, "events")
    assert(ev.groupBy(col("user_id"), col("ts")).count()
      .filter(col("count") > 1).isEmpty, "duplicate (user_id, ts) in events")
  }

  test("GDataset.dft emits k bins per group") {
    import spark.implicits._
    val df = (0 until 32).map(i => (i.toDouble, math.sin(2 * math.Pi * 3 * i / 32))).toDF("x", "y")
    val out = GDataset(df, "x", Nil).dft(8)
    val rows = out.df.collect()
    assert(rows.length == 8)
    val m3 = rows.find(_.getDouble(0) == 3.0).get.getDouble(1)
    assert(m3 > 10.0) // dominant bin
  }
}
