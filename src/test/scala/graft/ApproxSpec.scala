package graft

import org.apache.spark.sql.functions._

/** Error bounds for the approximate namespace (q_approx): the sketches
  * are rows-only at the oracle gate (engine-specific internals), so
  * their accuracy contract is pinned here against the exact answers. */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct is within 5% of exact per group") {
    val orders = Tables.t(spark, Sf, "orders")
    val both = orders.groupBy(col("o_orderpriority"))
      .agg(
        approx_count_distinct(col("o_custkey"), rsd = 0.01).as("approx"),
        countDistinct(col("o_custkey")).as("exact"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e < 0.05, s"${r.getString(0)}: hll $a vs exact $e")
    }
  }

  test("percentile_approx lands within 5% of the exact median per group") {
    val orders = Tables.t(spark, Sf, "orders")
    val approx = orders.groupBy(col("o_orderpriority"))
      .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("approx"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = orders.groupBy(col("o_orderpriority"))
      .agg(expr("percentile(o_totalprice, 0.5)").as("exact"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e) / e < 0.05, s"$k: ${approx(k)} vs $e")
    }
  }
}
