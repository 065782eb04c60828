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

  test("joinWhere range strategy equals the naive predicate join") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val l = Seq.tabulate(200)(i => (i.toLong, rnd.nextDouble() * 50, i % 5))
      .toDF("lid", "lx", "ltag")
    val r = Seq.tabulate(40) { i =>
      val lo = rnd.nextDouble() * 50
      (i.toLong, lo, lo + rnd.nextDouble() * 10, i % 5)
    }.toDF("rid", "rlo", "rhi", "rtag")
    val preds = Seq(
      col("lx") > col("rlo"), // strict bounds exercise the post-filter
      col("lx") <= col("rhi"),
      col("ltag") =!= col("rtag"))
    val got = RangeJoin.joinWhere(l, r, preds, bandWidth = 5.0)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = l.crossJoin(r)
      .filter(col("lx") > col("rlo") && col("lx") <= col("rhi") && col("ltag") =!= col("rtag"))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.nonEmpty)
  }

  test("joinWhere detects the bounded side when the interval is on the left") {
    import spark.implicits._
    val iv = Seq((1L, 0.0, 10.0), (2L, 20.0, 25.0)).toDF("iid", "lo", "hi")
    val pt = Seq((10L, 5.0), (11L, 22.0), (12L, 15.0)).toDF("pid", "x")
    // bounded expression x lives on the RIGHT frame here
    val got = RangeJoin.joinWhere(iv, pt,
        Seq(col("lo") <= col("x"), col("x") <= col("hi")), bandWidth = 8.0)
      .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 11L)))
  }

  test("joinWhere with an equality conjunct delegates to a key-equality join") {
    import spark.implicits._
    val l = Seq((1L, "a", 3.0), (2L, "b", 9.0)).toDF("lid", "lk", "lv")
    val r = Seq((10L, "a", 5.0), (11L, "b", 5.0)).toDF("rid", "rk", "rv")
    val df = RangeJoin.joinWhere(l, r, Seq(col("lk") === col("rk"), col("lv") < col("rv")))
    val got = df.select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 10L)))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"equality conjunct did not drive a key join:\n$plan")
  }

  test("joinWhere refuses to go cartesian on an unbandable predicate list") {
    import spark.implicits._
    val l = Seq((1L, 3.0)).toDF("lid", "lv")
    val r = Seq((10L, 5.0)).toDF("rid", "rv")
    val e = intercept[IllegalArgumentException](
      RangeJoin.joinWhere(l, r, Seq(col("lv") < col("rv")), bandWidth = 1.0))
    assert(e.getMessage.contains("cross product"))
    // overlapping column names are rejected up front, not silently suffixed
    val e2 = intercept[IllegalArgumentException](
      RangeJoin.joinWhere(l, l.withColumnRenamed("lid", "xid"),
        Seq(col("lv") < col("lv")), bandWidth = 1.0))
    assert(e2.getMessage.contains("disjoint"))
  }
}
