package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated per-group quantiles, distributed (SURVEY.md §2.2).
  *
  * The textbook formulation — `row_number().over(partitionBy(group)
  * .orderBy(value))` — puts every group in ONE task, so parallelism
  * equals the number of groups: fatal when groups are few and large
  * (3 return-flags × 33 B rows at 100 TB). Here global within-group
  * ranks are reconstructed from a RANGE partitioning instead:
  *
  *  1. range-partition by (group…, value): partitions hold disjoint,
  *     ordered key ranges, so a group's rows are ordered ACROSS
  *     partitions and each partition sorts locally — n·log(n/p) work
  *     per task, parallelism = #shuffle-partitions regardless of the
  *     group count;
  *  2. after the local sort, `monotonically_increasing_id` encodes the
  *     ordered local position; subtracting the per-(partition, group)
  *     minimum id (a tiny map-side-combined aggregate, broadcast back)
  *     yields the local in-group rank;
  *  3. adding the running count of the group's rows in earlier
  *     partitions (a window over that same tiny aggregate) yields the
  *     exact global rank — one wide shuffle total, no per-group
  *     serialization.
  *
  * The interpolation arithmetic (floor/ceil ranks + linear weights) is
  * spelled out so an external engine (the DuckDB oracle) executes
  * bit-identical math. Ties share a value, so their arbitrary relative
  * rank order cannot change any interpolated result.
  */
object Quantiles {

  /** Interpolation strategies (the polars `quantile(interpolation=)`
    * surface): how a percentile landing between two ranks resolves.
    * All five pick/blend the same two neighbor ranks, so they share one
    * range shuffle regardless of how many strategies a call mixes. */
  val Strategies: Set[String] = Set("linear", "lower", "higher", "nearest", "midpoint")

  /** One row per group with a column per requested percentile.
    *
    * @param ps (output column name, p in [0,1]) pairs — linear interpolation
    */
  def exactQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valCol: String,
      ps: Seq[(String, Double)]): DataFrame =
    exactQuantilesStrategy(df, groupCols, valCol,
      ps.map { case (name, p) => (name, p, "linear") })

  /** Exact linear-interpolated per-group quantiles for BOUNDED value
    * domains (enum-like columns: quantities, flags, bucket ids), via a
    * counts table instead of the range shuffle. The only data-sized
    * shuffle is a map-side-partial (group, value) count — one row per
    * distinct pair per mapper — after which every rank is reconstructed
    * from a c-weighted cumsum over the counts table; per-group window
    * state is the DOMAIN size (corpus-independent), so a 33 B-row group
    * with 50 distinct values costs a 50-row window task at any scale.
    * The r15 A/B at the 10× stress scale: 2.3 s (range) → 0.7 s
    * (counts) for the quantity median, values bit-equal.
    *
    * The interpolation arithmetic is the SAME expression per matched
    * rank as [[exactQuantilesStrategy]]'s linear branch —
    * v·(1 − |rank − idx|) with the floor and ceil terms added in fixed
    * order (two-term FP addition is commutative, so this matches the
    * range path's row-order sum bit for bit).
    *
    * NOT for continuous columns: there the counts table is data-sized,
    * the per-group window becomes one giant task, and the extra hash
    * aggregation buys no compression — use [[exactQuantiles]]. */
  def exactQuantilesCounts(
      df: DataFrame,
      groupCols: Seq[String],
      valCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    require(groupCols.nonEmpty,
      "exactQuantilesCounts needs group columns (a global variant would " +
        "need an unpartitioned window — use exactQuantiles)")
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0 && p <= 1 })
    val g = groupCols.map(col)
    val counts = df
      .select((groupCols :+ valCol).map(col): _*)
      .filter(col(valCol).isNotNull)
      .groupBy(g :+ col(valCol): _*)
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(g: _*).orderBy(col(valCol))
    val cum = counts
      .withColumn("__hi", sum(col("__c")).over(w) - 1)
      .withColumn("__lo", col("__hi") - col("__c") + 1)
      .withColumn("__n", sum(col("__c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    def q(p: Double): Column = {
      val idx = (col("__n").cast("double") - 1) * p
      val v = col(valCol)
      val fl = floor(idx)
      val ce = ceil(idx)
      sum(when(fl >= col("__lo") && fl <= col("__hi"),
        v * (lit(1.0) - abs(fl - idx))).otherwise(lit(0.0))) +
        sum(when(ce =!= fl && ce >= col("__lo") && ce <= col("__hi"),
          v * (lit(1.0) - abs(ce - idx))).otherwise(lit(0.0)))
    }
    cum.groupBy(g: _*).agg(
      ps.head match { case (name, p) => q(p).as(name) },
      ps.tail.map { case (name, p) => q(p).as(name) }: _*)
  }

  /** As [[exactQuantiles]] but with a per-output interpolation strategy.
    *
    * @param ps (output column name, p in [0,1], strategy) triples
    */
  def exactQuantilesStrategy(
      df: DataFrame,
      groupCols: Seq[String],
      valCol: String,
      ps: Seq[(String, Double, String)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p, _) => p >= 0 && p <= 1 })
    ps.foreach { case (_, _, s) =>
      require(Strategies.contains(s), s"unknown quantile strategy '$s' (${Strategies.mkString("/")})")
    }
    val g = groupCols.map(col)

    // 1. range shuffle + local sort; mid encodes (partition, position).
    //    Null values are excluded up front (SQL/DuckDB quantile
    //    semantics: quantiles are over the non-null values; without the
    //    filter, nulls sort first and shift every rank, and a
    //    percentile landing on a null rank would sum to a wrong value).
    val keys = g :+ col(valCol)
    val sorted = df
      .select((groupCols :+ valCol).map(col): _*)
      .filter(col(valCol).isNotNull)
      .repartitionByRange(keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("__mid", monotonically_increasing_id())

    // 2. tiny per-(partition, group) skeleton: row count + first id.
    //    #rows = #partitions × #groups-touching-them — broadcastable at
    //    any data scale (it grows with the cluster, not the data).
    val pid = graft.plans.PartitionIds.pid(col("__mid")).as("__pid")
    val skel = sorted
      .groupBy((pid +: g): _*)
      .agg(count(lit(1)).as("__c"), min(col("__mid")).as("__minmid"))
    val wOff = Window.partitionBy(g: _*)
      .orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val off = skel
      .withColumn("__off", sum(col("__c")).over(wOff) - col("__c"))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(g: _*)))

    // 3. exact global rank, then the interpolated quantiles. The
    //    offsets side is renamed wholesale — it shares lineage with
    //    `sorted`, and same-name references across a self-derived join
    //    are ambiguous.
    val offR = off.select(
      (col("__pid") +:
        groupCols.zipWithIndex.map { case (c, i) => col(c).as(s"__g$i") }) ++
        Seq(col("__minmid"), col("__off"), col("__n")): _*)
    val cond = groupCols.zipWithIndex
      .map { case (c, i) => col(c) <=> col(s"__g$i") }
      .foldLeft(graft.plans.PartitionIds.pid(col("__mid")) === col("__pid"))(_ && _)
    val ranked = sorted
      .join(broadcast(offR), cond)
      .select(
        (groupCols.map(col) :+
          col(valCol).as("__v") :+
          (col("__mid") - col("__minmid") + col("__off")).cast("double").as("__rn") :+
          col("__n").cast("double").as("__n2")): _*)

    // Each strategy is a different pick/blend of the same two neighbor
    // ranks floor(idx)/ceil(idx), spelled out as explicit arithmetic so
    // an external engine computes bit-identical results. `nearest`
    // rounds half-up (round() is half-away-from-zero in both Spark's
    // BigDecimal HALF_UP and DuckDB's std::round for the non-negative
    // idx). `midpoint` sums two half-weights, which collapse to 1.0
    // when idx is integral and floor == ceil match the same rank.
    def q(p: Double, strategy: String): Column = {
      val idx = (col("__n2") - 1) * p
      val rn = col("__rn")
      val v = col("__v")
      strategy match {
        case "linear" =>
          sum(when(rn === floor(idx) || rn === ceil(idx),
            v * (lit(1.0) - abs(rn - idx))).otherwise(lit(0.0)))
        case "lower" => sum(when(rn === floor(idx), v).otherwise(lit(0.0)))
        case "higher" => sum(when(rn === ceil(idx), v).otherwise(lit(0.0)))
        case "nearest" => sum(when(rn === round(idx, 0), v).otherwise(lit(0.0)))
        case "midpoint" =>
          sum(when(rn === floor(idx), v * 0.5).otherwise(lit(0.0))
            + when(rn === ceil(idx), v * 0.5).otherwise(lit(0.0)))
      }
    }
    ranked
      .groupBy(groupCols.map(col): _*)
      .agg(ps.head match { case (name, p, s) => q(p, s).as(name) },
        ps.tail.map { case (name, p, s) => q(p, s).as(name) }: _*)
  }
}
