package graft

import org.apache.spark.sql.functions._
import graft.operators.{Binning, Quantiles}
import graft.core.GDataset

class BinningSpec extends SparkSpec {

  test("cut: right-closed intervals, explicit labels, nulls stay null") {
    import spark.implicits._
    val df = Seq[Option[Double]](Some(5), Some(10), Some(10.5), Some(25), Some(26), None)
      .toDF("v")
    val got = Binning.cut(df, "v", Seq(10, 25), Seq("lo", "mid", "hi"), out = "b")
      .select(col("b")).as[Option[String]].collect().toSeq
    // right-closed: (−inf,10], (10,25], (25,inf) — 10 is lo, 25 is mid
    assert(got == Seq(Some("lo"), Some("lo"), Some("mid"), Some("mid"), Some("hi"), None))
  }

  test("clip: bounds pull, null values stay null, null bound skips a side") {
    import spark.implicits._
    val df = Seq[(Option[Double], Option[Double])](
      (Some(1.0), Some(5.0)), (Some(7.0), Some(5.0)), (Some(20.0), None),
      (None, Some(5.0)))
      .toDF("v", "cap")
    val got = df.select(
        Binning.clip(col("v"), Some(lit(3.0)), Some(col("cap"))).as("c"))
      .as[Option[Double]].collect().toSeq
    // 1 floors to 3; 7 caps to 5; null cap leaves 20 unclipped above
    // (floor still applies); null value stays null
    assert(got == Seq(Some(3.0), Some(5.0), Some(20.0), None))
    val oneSided = df.select(
        Binning.clip(col("v"), None, Some(lit(5.0))).as("c"))
      .as[Option[Double]].collect().toSeq
    assert(oneSided == Seq(Some(1.0), Some(5.0), Some(5.0), None))
    intercept[IllegalArgumentException](Binning.clip(col("v")))
  }

  test("cut: left-closed flips the boundary side") {
    import spark.implicits._
    val df = Seq(10.0, 25.0).toDF("v")
    val got = Binning.cut(df, "v", Seq(10, 25), Seq("lo", "mid", "hi"),
        leftClosed = true, out = "b")
      .select(col("b")).as[String].collect().toSeq
    // left-closed: [−inf,10), [10,25), [25,inf] — 10 is mid, 25 is hi
    assert(got == Seq("mid", "hi"))
  }

  test("cut: default labels are polars interval notation") {
    assert(Binning.defaultCutLabels(Seq(10, 25.5), leftClosed = false) ==
      Seq("(-inf, 10]", "(10, 25.5]", "(25.5, inf]"))
    assert(Binning.defaultCutLabels(Seq(10), leftClosed = true) ==
      Seq("[-inf, 10)", "[10, inf)"))
    import spark.implicits._
    val got = Binning.cut(Seq(3.0, 12.0, 30.0).toDF("v"), "v", Seq(10, 25), out = "b")
      .select(col("b")).as[String].collect().toSeq
    assert(got == Seq("(-inf, 10]", "(10, 25]", "(25, inf]"))
  }

  test("cut: validation — unsorted breaks and wrong label count reject") {
    import spark.implicits._
    val df = Seq(1.0).toDF("v")
    intercept[IllegalArgumentException](Binning.cut(df, "v", Seq(25, 10)))
    intercept[IllegalArgumentException](Binning.cut(df, "v", Seq(10, 25), Seq("a", "b")))
    intercept[IllegalArgumentException](Binning.cut(df, "v", Nil))
  }

  test("qcut: global quartiles match the exact-quantile breaks") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(400)(rnd.nextDouble() * 100).toDF("v")
    val breaks = Quantiles.exactQuantiles(df, Nil, "v",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75))
      .collect().head
    val (b25, b50, b75) = (breaks.getDouble(0), breaks.getDouble(1), breaks.getDouble(2))
    val got = Binning.qcut(df, "v", Seq(0.25, 0.5, 0.75), out = "b")
    // default labels q1..q4; membership agrees with the break values
    got.collect().foreach { r =>
      val (v, b) = (r.getDouble(0), r.getString(1))
      val want =
        if (v <= b25) "q1" else if (v <= b50) "q2" else if (v <= b75) "q3" else "q4"
      assert(b == want, s"v=$v got $b want $want")
    }
    // quartiles of a continuous draw are balanced to within ±1
    val sizes = got.groupBy(col("b")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set("q1", "q2", "q3", "q4"))
    assert(sizes.values.forall(n => n >= 99 && n <= 101), sizes.toString)
  }

  test("qcut: per-group breaks bin each group by its own distribution") {
    import spark.implicits._
    // group a ∈ [0,100), group b ∈ [1000,1100): a shared global break
    // would put all of a in q1 — per-group medians must split each
    val df = (Seq.tabulate(100)(i => ("a", i.toDouble)) ++
      Seq.tabulate(100)(i => ("b", 1000.0 + i))).toDF("g", "v")
    val got = Binning.qcut(df, "v", Seq(0.5), Seq("lo", "hi"),
        groupCols = Seq("g"), out = "b")
      .groupBy(col("g"), col("b")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("a", "lo")) == 50 && got(("a", "hi")) == 50)
    assert(got(("b", "lo")) == 50 && got(("b", "hi")) == 50)
  }

  test("qcut: validation — quantiles outside (0,1) or unsorted reject") {
    import spark.implicits._
    val df = Seq(1.0).toDF("v")
    intercept[IllegalArgumentException](Binning.qcut(df, "v", Seq(0.5, 0.25)))
    intercept[IllegalArgumentException](Binning.qcut(df, "v", Seq(0.0, 0.5)))
    intercept[IllegalArgumentException](Binning.qcut(df, "v", Seq(0.5, 1.0)))
  }

  test("wrapper cut/qcut preserve index and id_vars, add the bin as a value var") {
    import spark.implicits._
    val gd = GDataset(
      Seq((1L, "x", 5.0), (2L, "x", 50.0)).toDF("t", "id", "v"), "t", Seq("id"))
    val c = gd.cut("v", Seq(10), Seq("lo", "hi"), out = "vbin")
    assert(c.index == "t" && c.idVars == Seq("id"))
    assert(c.valueVars.contains("vbin"))
    val q = gd.qcut("v", Seq(0.5), Seq("lo", "hi"), out = "vq")
    assert(q.valueVars.contains("vq") && q.df.count() == 2)
  }
}
