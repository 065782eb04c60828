package graft

import org.apache.spark.sql.functions._
import graft.operators.Salt

class SaltSpec extends SparkSpec {

  test("saltedJoin returns exactly the rows of the unsalted join") {
    val o = Tables.t(spark, Sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val c = Tables.t(spark, Sf, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = o.join(c, Seq("o_custkey"))
    val salted = Salt.saltedJoin(o, c, Seq("o_custkey"), factor = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salted left join keeps unmatched left rows exactly once") {
    import spark.implicits._
    val l = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "lv")
    val r = Seq((1L, 10.0)).toDF("k", "rv")
    val out = Salt.saltedJoin(l, r, Seq("k"), factor = 4, joinType = "left")
      .collect().map(re => (re.getLong(0), re.getString(1), if (re.isNullAt(2)) None else Some(re.getDouble(2))))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a", Some(10.0)), (2L, "b", None), (3L, "c", None)))
  }
}
