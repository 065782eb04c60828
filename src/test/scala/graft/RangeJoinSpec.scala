package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {

  test("banded range join equals the naive inequality join") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val points = Seq.tabulate(300)(i => (i.toLong, rnd.nextDouble() * 100 - 20))
      .toDF("pid", "x")
    // interval lengths from 0 to ~30: many span several 5-wide bands
    val ivs = Seq.tabulate(60) { i =>
      val lo = rnd.nextDouble() * 100 - 20
      (i.toLong, lo, lo + rnd.nextDouble() * 30)
    }.toDF("iid", "lo", "hi")

    val got = RangeJoin.pointInInterval(points, ivs, "x", "lo", "hi", bandWidth = 5.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = points.join(ivs, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.nonEmpty)
  }

  test("range join drops empty intervals and honors equi-keys") {
    import spark.implicits._
    val points = Seq((1L, "a", 5.0), (2L, "b", 5.0)).toDF("pid", "k", "x")
    val ivs = Seq((10L, "a", 0.0, 10.0), (11L, "a", 8.0, 2.0)).toDF("iid", "k", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivs, "x", "lo", "hi",
        by = Seq("k"), bandWidth = 4.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L))) // key b unmatched; inverted interval dropped
  }
}
