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
