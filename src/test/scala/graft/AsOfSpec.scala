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
}
