package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the ANALYZE-style per-column summary every
  * curation run starts from: row count, null count, distinct count,
  * and min/max rendered as strings, one output row per column.
  *
  * Reference parity: the reference exposes polars `describe()` /
  * `null_count()` / `n_unique()` per column through its forwarding
  * surface (polars_dataset.py:74-78); this is the corpus-profiling
  * composition of those — one call, every column, one scan.
  *
  * 100 TB shape: ONE pass over the table. All per-column aggregates
  * ride in a single `agg(...)`; the exact-distinct counts compile to
  * Catalyst's Expand-based multi-distinct rewrite (still one scan of
  * the parquet, k-way expand before the partial aggregate), and the
  * wide 1-row result is unpivoted to (column, ...) rows driver-free
  * with a `stack` projection over the single aggregated row. For
  * tables where exact distinct is not worth the expand factor,
  * [[profileApprox]] swaps in HLL++ `approx_count_distinct` — no
  * Expand, plain partial aggregation, the scale default.
  */
object Profile {

  private def summary(df: DataFrame, cols: Seq[String], nd: String => Column): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val fields = df.schema.fieldNames.toSet
    cols.foreach(c => require(fields.contains(c), s"no such column: $c"))
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).as(s"__nulls_$c"),
        nd(c).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the 1-row wide aggregate into one row per column with an
    // array-of-structs explode — a plain projection over the single
    // aggregated row; nothing visits the driver
    val packed = one.select(col("__n").as("n_rows"),
      array(cols.map(c => struct(
        lit(c).as("column"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__nd_$c").cast("long").as("n_distinct"),
        col(s"__min_$c").as("min_str"),
        col(s"__max_$c").as("max_str"))): _*).as("__cols"))
    packed
      .select(col("n_rows"), explode(col("__cols")).as("c"))
      .select(col("c.column").as("column"), col("n_rows"),
        col("c.n_nulls").as("n_nulls"), col("c.n_distinct").as("n_distinct"),
        col("c.min_str").as("min_str"), col("c.max_str").as("max_str"))
  }

  /** Exact profile: distinct counts via `count(DISTINCT c)` (Expand
    * rewrite — one scan, k-way row multiplication before the partial
    * agg). Right when the profile IS the deliverable and must be
    * exact; at 100 TB prefer [[profileApprox]]. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    summary(df, cols, c => countDistinct(col(c)))

  /** Scale profile: HLL++ sketched distinct counts (relative error
    * `rsd`, default 1.5%) — no Expand, every aggregate partial, one
    * plain scan regardless of column count. */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.015): DataFrame =
    summary(df, cols, c => approx_count_distinct(col(c), rsd))

  /** The MERGEABLE profile state — incremental ANALYZE: one row per
    * column holding (n_rows, n_nulls, Datasketches-HLL sketch of the
    * column's distinct values). Counts are additive and HLL sketches
    * union losslessly, so a standing corpus profile folds each new
    * ingest batch in ([[mergeProfileSums]]) without ever rescanning
    * history — the freeze/fold contract the drift and health monitors
    * use, applied to table statistics. Values sketch through their
    * string rendering so one binary state column serves every column
    * type (renderings are distinct-preserving for the integer/string
    * columns profiling cares about).
    *
    * min/max are deliberately NOT part of the mergeable state: the
    * state would hold them as strings, and string-rendering order is
    * not value order for signed/variable-width numerics — a merged
    * "min" would be silently wrong. Exact extremes come from
    * [[profile]]'s typed single-scan aggregates.
    *
    * 100 TB shape: ONE scan per batch, every aggregate partial
    * (sketches merge map-side), state is |cols| rows of a few KB. */
  def profileSums(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val fields = df.schema.fieldNames.toSet
    cols.foreach(c => require(fields.contains(c), s"no such column: $c"))
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).as(s"__nulls_$c"),
        hll_sketch_agg(col(c).cast("string")).as(s"__hll_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(col("__n").as("n_rows"),
      array(cols.map(c => struct(
        lit(c).as("column"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__hll_$c").as("sketch"))): _*).as("__cols"))
      .select(col("n_rows"), explode(col("__cols")).as("c"))
      .select(col("c.column").as("column"), col("n_rows"),
        col("c.n_nulls").as("n_nulls"), col("c.sketch").as("sketch"))
  }

  /** Fold two [[profileSums]] states (empty-side-safe): counts add,
    * sketches union. */
  def mergeProfileSums(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("column")).agg(
      sum(col("n_rows")).as("n_rows"),
      sum(col("n_nulls")).as("n_nulls"),
      hll_union_agg(col("sketch")).as("sketch"))

  /** Readable report from a [[profileSums]] state: distinct estimates
    * out of the sketches. */
  def finalizeProfile(sums: DataFrame): DataFrame =
    sums.select(col("column"), col("n_rows"), col("n_nulls"),
      hll_sketch_estimate(col("sketch")).as("n_distinct_est"))
}
