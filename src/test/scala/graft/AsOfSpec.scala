package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOf

class AsOfSpec extends SparkSpec {

  test("asof join picks latest right row at-or-before each left row, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "p1"), (1L, 205L, "p2"), (1L, 50L, "p0"),
      (2L, 150L, "p3")
    ).toDF("k", "t", "name")
    val right = Seq(
      (1L, 100L, 10.0), (1L, 200L, 20.0), (1L, 300L, 30.0),
      (2L, 151L, 99.0)
    ).toDF("k", "t", "v")

    val out = AsOf.joinAsOf(left, right, "t", Seq("k"), Map("t" -> "rt", "v" -> "rv"))
      .select("name", "rt", "rv").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else (r.getLong(1), r.getDouble(2))))
      .toMap

    assert(out("p1") == ((100L, 10.0))) // equal timestamp matches
    assert(out("p2") == ((200L, 20.0)))
    assert(out("p0") == null)           // nothing at or before 50
    assert(out("p3") == null)           // right row is after left
  }

  test("asof null left on/by keys match nothing in every strategy") {
    import spark.implicits._
    // polars join_asof: a null key is not comparable — no match. The
    // forward scan sorts left NULL `on` last under desc order, so an
    // unguarded last() would hand it the min-`on` right row; nearest
    // would then inherit that spurious forward match.
    val left = Seq(
      (Some(1L), None: Option[Long], "null_on"),
      (None: Option[Long], Some(100L), "null_by"),
      (Some(1L), Some(100L), "clean")
    ).toDF("k", "t", "name")
    val right = Seq((1L, 50L, 7.0), (1L, 150L, 9.0)).toDF("k", "t", "v")
    for (s <- Seq("backward", "forward", "nearest")) {
      val out = AsOf.joinAsOf(left, right, "t", Seq("k"), Map("v" -> "rv"), strategy = s)
        .select("name", "rv").collect()
        .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
      assert(out("null_on") == null, s"$s matched a null `on` row")
      assert(out("null_by") == null, s"$s matched a null by-key row")
      assert(out("clean") != null, s"$s lost the clean row's match")
    }
  }

  test("asof forward picks earliest right row at-or-after; nearest picks closer side") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "p1"), (1L, 205L, "p2"), (1L, 350L, "p3"),
      (2L, 150L, "p4")
    ).toDF("k", "t", "name")
    val right = Seq(
      (1L, 100L, 10.0), (1L, 200L, 20.0), (1L, 300L, 30.0),
      (2L, 120L, 99.0)
    ).toDF("k", "t", "v")

    def run(strategy: String) =
      AsOf.joinAsOf(left, right, "t", Seq("k"), Map("t" -> "rt", "v" -> "rv"), strategy)
        .select("name", "rt").collect()
        .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getLong(1)))
        .toMap

    val fwd = run("forward")
    assert(fwd("p1") == 100L) // equal timestamp matches
    assert(fwd("p2") == 300L) // earliest at-or-after 205
    assert(fwd("p3") == null) // nothing at or after 350
    assert(fwd("p4") == null) // right row is before left

    val near = run("nearest")
    assert(near("p1") == 100L)
    assert(near("p2") == 200L) // 205 is closer to 200 than 300
    assert(near("p3") == 300L) // only a backward candidate
    assert(near("p4") == 120L) // only a backward candidate for key 2
  }

  test("asof nearest resolves exact ties backward") {
    import spark.implicits._
    val left = Seq((1L, 150L, "mid")).toDF("k", "t", "name")
    val right = Seq((1L, 100L, 1.0), (1L, 200L, 2.0)).toDF("k", "t", "v")
    val out = AsOf.joinAsOf(left, right, "t", Seq("k"), Map("t" -> "rt", "v" -> "rv"), "nearest")
      .select("rt").head()
    assert(out.getLong(0) == 100L)
  }

  test("asof tolerance bounds the match distance in every strategy") {
    import spark.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 300L, "b")).toDF("k", "t", "name")
    val right = Seq((1L, 90L, 1.0), (1L, 130L, 2.0)).toDF("k", "t", "v")

    def run(strategy: String, tol: Double) =
      AsOf.joinAsOf(left, right, "t", Seq("k"), Map("t" -> "rt", "v" -> "rv"),
          strategy, tolerance = Some(tol))
        .select("name", "rt").collect()
        .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getLong(1)))
        .toMap

    val back = run("backward", 15.0)
    assert(back("a") == 90L)   // distance 10 <= 15
    assert(back("b") == null)  // nearest earlier is 170 away
    val fwd = run("forward", 15.0)
    assert(fwd("a") == null)   // nearest later is 30 away
    val near = run("nearest", 12.0)
    assert(near("a") == 90L)   // backward 10 in band, forward 30 out
    assert(near("b") == null)
  }

  test("asof allowExactMatches=false skips the equal-timestamp row") {
    import spark.implicits._
    val left = Seq((1L, 100L, "x")).toDF("k", "t", "name")
    val right = Seq((1L, 100L, 1.0), (1L, 80L, 2.0), (1L, 130L, 3.0)).toDF("k", "t", "v")

    def run(strategy: String) =
      AsOf.joinAsOf(left, right, "t", Seq("k"), Map("t" -> "rt", "v" -> "rv"),
          strategy, allowExactMatches = false)
        .select("rt").head()

    assert(run("backward").getLong(0) == 80L)  // 100 excluded
    assert(run("forward").getLong(0) == 130L)  // 100 excluded
    assert(run("nearest").getLong(0) == 80L)   // |Δ|=20 backward beats 30 forward
  }

  test("a left row with null `on` matches nothing in any strategy") {
    import spark.implicits._
    val left = Seq((1L, Option.empty[Long], "n"), (1L, Option(200L), "ok"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 100L, 1.0), (1L, 250L, 2.0)).toDF("k", "t", "v")
    val expected = Map("backward" -> 100L, "forward" -> 250L, "nearest" -> 250L)
    for (strategy <- Seq("backward", "forward", "nearest")) {
      val out = AsOf.joinAsOf(left, right, "t", Seq("k"), Map("t" -> "rt", "v" -> "rv"), strategy)
        .select("name", "rt").collect()
        .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getLong(1)))
        .toMap
      assert(out("n") == null, s"null-on row matched under $strategy")
      assert(out("ok") == expected(strategy), s"non-null row lost its match under $strategy")
    }
  }
}
