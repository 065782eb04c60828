package graft.core

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Interpolation, SplineOptions}

/** Spark-native re-expression of the reference's `Dataset` wrapper
  * (reference: polars_dataset.py:11-306): a DataFrame plus an `index`
  * coordinate column and `idVars` identifier columns. Every value
  * column not in `idVars + index` is a value variable.
  *
  * Unlike the eager polars wrapper, `df` here is a lazy Catalyst plan;
  * every method returns a new immutable GDataset whose plan extends the
  * parent's — distributed lazy evaluation for free.
  */
final case class GDataset(df: DataFrame, index: String, idVars: Seq[String]) {
  require(
    df.columns.contains(index),
    s"The column `$index` is not in DataFrame (reference polars_dataset.py:109-112 semantics)")

  /** id_vars are pruned, not errored, when a transform drops them
    * (reference polars_dataset.py:113-114). */
  def prunedIdVars: Seq[String] = idVars.filter(df.columns.contains)

  /** Columns that are neither id_vars nor the index (polars_dataset.py:163-169). */
  def valueVars: Seq[String] = {
    val meta = (idVars :+ index).toSet
    df.columns.toSeq.filterNot(meta.contains)
  }

  /** Reassign metadata with validation (polars_dataset.py:138-143). */
  def set(index: String = this.index, idVars: Seq[String] = this.idVars): GDataset = {
    require(df.columns.contains(index), s"The column `$index` is not in DataFrame")
    idVars.foreach(c => require(df.columns.contains(c), s"Unknown id_var `$c`"))
    GDataset(df, index, idVars).sortColumns
  }

  /** Apply an arbitrary DataFrame transform, keeping metadata; errors if
    * the index is dropped, prunes dropped id_vars (polars_dataset.py:105-115).
    * This is the Spark analogue of the reference's `__getattr__` forwarding:
    * the whole DataFrame API is reachable while metadata is preserved. */
  def transform(f: DataFrame => DataFrame): GDataset = {
    val out = f(df)
    require(
      out.columns.contains(index),
      s"The transformation does not preserve the index, `$index`")
    GDataset(out, index, idVars.filter(out.columns.contains))
  }

  def select(cols: Column*): GDataset = transform(_.select(cols: _*))

  /** Keep metadata columns, replace value columns (polars_dataset.py:153-158).
    * polars hstack is row-position alignment; in a distributed engine the
    * only scale-safe equivalent is computing the new values in the same
    * projection — semantics identical when exprs derive from this df. */
  def selectData(cols: Column*): GDataset = {
    val meta = prunedIdVars.map(col) :+ col(index)
    transform(_.select(meta ++ cols: _*))
  }

  /** Raw projection escaping the wrapper (polars_dataset.py:160-161). */
  def fetch(cols: Column*): DataFrame = df.select(cols: _*)

  /** Single-column accessor (reference `__getitem__`,
    * polars_dataset.py:80-81): Spark's `Column` is the lazy Series
    * analogue — usable in any expression against this dataset. */
  def apply(name: String): Column = df(name)

  def filter(cond: Column): GDataset = transform(_.filter(cond))

  def withColumns(pairs: (String, Column)*): GDataset =
    transform(d => pairs.foldLeft(d) { case (acc, (n, c)) => acc.withColumn(n, c) })

  /** Metadata-aware join: id_vars union preserving left-first order
    * (polars_dataset.py:171-187). */
  def join(other: GDataset, usingColumns: Seq[String], joinType: String = "inner"): GDataset = {
    val mergedIds = idVars ++ other.idVars.filterNot(idVars.contains)
    val joined = df.join(other.df, usingColumns, joinType)
    GDataset(joined, index, mergedIds.filter(joined.columns.contains))
  }

  def joinDf(other: DataFrame, usingColumns: Seq[String], joinType: String = "inner"): GDataset =
    transform(_.join(other, usingColumns, joinType))

  /** Metadata-aware rename (polars_dataset.py:189-194). */
  def rename(mapping: Map[String, String]): GDataset =
    GDataset(
      df.withColumnsRenamed(mapping),
      mapping.getOrElse(index, index),
      idVars.map(c => mapping.getOrElse(c, c)))

  def pipe[A](f: GDataset => A): A = f(this)

  /** Pipe through a function returning a raw DataFrame, re-wrapped to
    * the canonical columns (reference polars_dataset.py:196-202: when
    * pipe's function escapes the wrapper, the result is re-selected as
    * id_vars | index | original value_vars — extra columns dropped,
    * missing ones an error). */
  def pipeDf(f: GDataset => DataFrame): GDataset = {
    val out = f(this)
    GDataset(
      out.select((prunedIdVars ++ Seq(index) ++ valueVars).map(col): _*),
      index, prunedIdVars)
  }

  /** Drop columns; index is protected (polars_dataset.py:265-272). */
  def drop(names: String*): GDataset = {
    require(!names.contains(index), "Cannot drop the `index` column")
    transform(_.drop(names: _*))
  }

  /** Whole-row dedup on `subset` with the polars `unique(keep=)`
    * variants. A distributed frame has no implicit row order, so
    * "first"/"last" take the winner's total order explicitly via
    * `orderBy`; when omitted they fall back to frame appearance order
    * (monotonically_increasing_id — numeric order IS appearance order,
    * the same single-pass trick as [[coord]]; stable for a sorted scan).
    *
    *  - "first": lowest-ordered row per key — one row_number window
    *    over a single (subset) shuffle;
    *  - "last": highest-ordered row per key — same shuffle, rn == count
    *    (reversing arbitrary order expressions isn't generally
    *    possible, so last is picked against the count, not a desc sort);
    *  - "none": drop every row whose key repeats — one count window,
    *    no self-join back to the input;
    *  - "any": cheapest representative, Spark's dropDuplicates —
    *    map-side partial dedup BEFORE the shuffle (the others must
    *    shuffle whole rows); winner is partition-order-dependent.
    */
  def unique(subset: Seq[String], keep: String = "any", orderBy: Seq[Column] = Nil): GDataset = {
    import org.apache.spark.sql.expressions.Window
    require(subset.nonEmpty, "unique needs at least one subset column")
    transform { d =>
      lazy val withOrd =
        if (orderBy.nonEmpty) (d, orderBy)
        else {
          val o = d.withColumn("__ord", monotonically_increasing_id())
          (o, Seq(col("__ord")))
        }
      val out = keep match {
        case "first" | "last" =>
          val (dd, ord) = withOrd
          val key = Window.partitionBy(subset.map(col): _*)
          val w = key.orderBy(ord: _*)
          val ranked = dd.withColumn("__rn", row_number().over(w))
          val kept =
            if (keep == "first") ranked.filter(col("__rn") === 1)
            else ranked
              .withColumn("__n", count(lit(1)).over(key))
              .filter(col("__rn") === col("__n"))
          kept.drop("__rn", "__n")
        case "none" =>
          d.withColumn("__n", count(lit(1)).over(Window.partitionBy(subset.map(col): _*)))
            .filter(col("__n") === 1)
            .drop("__n")
        case "any" => d.dropDuplicates(subset)
        case other =>
          throw new IllegalArgumentException(
            s"unknown keep variant '$other' (first/last/none/any)")
      }
      out.drop("__ord")
    }
  }

  /** Unique values of a column in first-appearance order — exactly the
    * reference's `unique(maintain_order=True)` (polars_dataset.py:274-275),
    * kept distributed AND single-pass: `monotonically_increasing_id`
    * encodes (partition, local position), so its NUMERIC ORDER is
    * frame appearance order even though the ids aren't contiguous —
    * min(id) per value is the appearance rank without the two-pass
    * offset computation a contiguous index (withRowIndex) needs.
    * Appearance order is well-defined when the plan's output order is
    * (parquet file listing is sorted; a trailing sort pins it
    * completely). */
  def coord(name: String): DataFrame =
    df.select(col(name), monotonically_increasing_id().as("__ord"))
      .groupBy(col(name)).agg(min(col("__ord")).as("__first"))
      .orderBy(col("__first"))
      .select(name)

  /** (min, max) of a column (polars_dataset.py:277-280). */
  def extrema(name: String): (Any, Any) = {
    val r = df.agg(min(col(name)).as("min"), max(col(name)).as("max")).head()
    (r.get(0), r.get(1))
  }

  def extremaDf(name: String): DataFrame =
    df.agg(min(col(name)).as("min"), max(col(name)).as("max"))

  /** Sort; bare call auto-sorts by id_vars then index (polars_dataset.py:282-287). */
  def sort(cols: Column*): GDataset =
    if (cols.isEmpty) transform(_.orderBy((prunedIdVars :+ index).map(col): _*))
    else transform(_.orderBy(cols: _*))

  /** Canonical column order id_vars | index | values (polars_dataset.py:289-292). */
  def sortColumns: GDataset =
    transform(d => d.select((prunedIdVars ++ Seq(index) ++ valueVars).map(col): _*))

  /** Drop rows where ANY numeric (or nested-struct numeric) field is NaN
    * (polars_dataset.py:294-306, incl. the struct unnest round-trip). */
  def dropNan: GDataset = transform { d =>
    def nanChecks(schema: StructType, prefix: String): Seq[Column] =
      schema.fields.toSeq.flatMap { f =>
        val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        f.dataType match {
          case DoubleType | FloatType => Seq(isnan(col(path)))
          case s: StructType          => nanChecks(s, path)
          case _                      => Nil
        }
      }
    val checks = nanChecks(d.schema, "")
    if (checks.isEmpty) d
    else d.filter(!checks.reduce(_ || _))
  }

  def show(n: Int = 20): Unit = df.show(n, truncate = false)

  /** Notebook HTML repr with metadata highlighting (reference
    * `_repr_html_`, polars_dataset.py:86-96: index cells green-tinted,
    * id_vars cells blue-tinted). Renders the first `n` rows only —
    * a bounded `take(n)`, never a full collect. */
  def reprHtml(n: Int = 10): String = {
    def esc(s: String) = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val cols = df.columns.toSeq
    val style = cols.map {
      case c if c == index => " style=\"background-color: rgba(0,128,0,0.1);\""
      case c if idVars.contains(c) => " style=\"background-color: rgba(0,128,255,0.1);\""
      case _ => ""
    }
    val head = cols.map(c => s"<th>${esc(c)}</th>").mkString
    val body = df.take(n).map { row =>
      cols.indices.map { i =>
        val v = row.get(i)
        s"<td${style(i)}>${esc(if (v == null) "null" else v.toString)}</td>"
      }.mkString("<tr>", "", "</tr>")
    }.mkString
    s"<table class=\"dataframe\"><thead><tr>$head</tr></thead><tbody>$body</tbody></table>"
  }

  /** Unnest a struct column into top-level fields (reference
    * polars_dataset.py:240-263 round-trip, polars `unnest`). */
  def unnest(structCol: String): GDataset = transform { d =>
    val fields = d.schema(structCol).dataType match {
      case s: StructType => s.fieldNames.toSeq
      case other => throw new IllegalArgumentException(
        s"`$structCol` is $other, not a struct")
    }
    val keep = d.columns.toSeq.filterNot(_ == structCol)
    val clashes = fields.intersect(keep)
    require(clashes.isEmpty,
      s"unnest of `$structCol` would shadow existing column(s): ${clashes.mkString(", ")}")
    d.select(keep.map(col) ++ fields.map(f => col(s"$structCol.$f").as(f)): _*)
  }

  /** Rebuild columns into a struct (polars `to_struct` side of the
    * round-trip). The index cannot be swallowed into the struct. */
  def nest(fieldCols: Seq[String], as: String): GDataset = {
    require(!fieldCols.contains(index), "cannot nest the index column")
    transform(d =>
      d.withColumn(as, struct(fieldCols.map(col): _*)).drop(fieldCols: _*))
  }

  /** Summary statistics (count/null_count/mean/std/min/max) per numeric
    * value var (polars describe analogue), numeric-typed output. One
    * unpivot (no shuffle) + one partial-agg-friendly groupBy over #cols
    * groups — a single pass regardless of column count. Values ride the
    * unpivot inside a single-field struct, which is never null, so
    * null CELLS always survive into the aggregation and null_count is
    * exact whatever unpivot's null policy is. */
  def describe(cols: String*): DataFrame = {
    val targets = if (cols.nonEmpty) cols.toSeq else numericValueVars
    df.unpivot(
        Array.empty[Column],
        targets.map(c => struct(col(c).cast("double").as("v")).as(c)).toArray,
        "col_name", "s")
      .select(col("col_name"), col("s.v").as("v"))
      .groupBy(col("col_name"))
      .agg(
        count(col("v")).as("count"),
        (count(lit(1)) - count(col("v"))).as("null_count"),
        avg(col("v")).as("mean"),
        stddev_samp(col("v")).as("std"),
        min(col("v")).as("min"),
        max(col("v")).as("max"))
  }

  /** Deterministic hash sample: keeps rows whose md5(key) falls in the
    * first `sixteenths`/16 of hex space. Unlike `df.sample`, the kept
    * set is a pure function of the key — stable across partitionings,
    * reruns, and engines (the polars `sample(seed=)` analogue that
    * actually reproduces at 100 TB). */
  def sampleByHash(key: Column, sixteenths: Int): GDataset =
    // delegated so both entry points share one predicate AND one
    // key-type guard (double/timestamp/decimal keys render differently
    // across engines — the operator path rejects them at plan time, and
    // the wrapper must enforce the same determinism contract)
    transform(graft.operators.Sampling.hashSample(_, key, sixteenths))

  /** polars sample(weights=) on the wrapper: deterministic
    * weight-proportional draw of n rows without replacement
    * (Sampling.weightedSample — Efraimidis–Spirakis keys, one
    * TakeOrdered, partitioning-independent). */
  def sampleWeighted(key: Column, weight: Column, n: Int): GDataset =
    transform(graft.operators.Sampling.weightedSample(_, key, weight, n))

  /** Per-stratum weighted draw on the wrapper: the n best E-S keys
    * within each stratum (Sampling.weightedSampleByStratum — one
    * stratum shuffle, WindowGroupLimit heaps, deterministic). */
  def sampleWeightedByStratum(
      key: Column, weight: Column, stratum: Column, nPerStratum: Int): GDataset =
    transform(graft.operators.Sampling
      .weightedSampleByStratum(_, key, weight, stratum, nPerStratum))

  /** Rate-form weighted draw on the wrapper (Sampling.
    * weightedSampleRate): scan-side E-S-key threshold filter — no
    * ordering, no driver merge — for samples past the TakeOrdered
    * bound; size is binomial around Σ(1 − e^{−t·w}). */
  def sampleWeightedRate(key: Column, weight: Column, threshold: Double): GDataset =
    transform(graft.operators.Sampling
      .weightedSampleRate(_, key, weight, threshold))

  /** polars `partition_by`: split into one GDataset per distinct key
    * tuple. DELIBERATELY driver-enumerated — a Map of frames IS a
    * driver structure, so this is the one polars surface that cannot
    * stay fully lazy; the group count is capped loudly (`maxGroups`)
    * and each member stays a LAZY filter plan over the shared source
    * (no per-group shuffle, no materialization — Catalyst pushes the
    * equality predicate into the scan, so writing each member prunes
    * partitions). For group-wise PROCESSING at 100 TB use
    * groupBy/mapGroupsSeries instead; this is for
    * fan-out-to-named-outputs workflows (one sink per language). Null
    * keys form their own group, matching polars.
    *
    * Key columns must be ATOMIC types: group predicates are rebuilt
    * from collected values via `lit(v) === col`, and array/map/struct
    * values don't round-trip through lit() (guarded below). The key
    * enumeration is a SNAPSHOT: keys are collected once at call time,
    * so rows gaining NEW key values on a re-read or non-deterministic
    * source fall outside every member — materialize (cache/write) a
    * volatile source before partitioning it. */
  def partitionByGroups(
      cols: Seq[String], maxGroups: Int = 1000): Map[Seq[Any], GDataset] = {
    require(cols.nonEmpty, "partitionByGroups needs at least one key column")
    val schema = df.schema
    for (c <- cols) {
      val dt = schema(c).dataType
      require(dt match {
        case _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.MapType |
             _: org.apache.spark.sql.types.StructType => false
        case _ => true
      }, s"partitionByGroups key '$c' has complex type ${dt.simpleString}; " +
        "group predicates are rebuilt via lit() and only atomic keys compare " +
        "correctly — derive an atomic key column first")
    }
    val keys = df.select(cols.map(col): _*).distinct().limit(maxGroups + 1).collect()
    require(keys.length <= maxGroups,
      s"partitionByGroups: more than $maxGroups distinct groups — raise maxGroups " +
        "deliberately or aggregate instead of fanning out")
    keys.map { r =>
      val vals = cols.indices.map(r.get)
      val pred = cols.zip(vals).map { case (c, v) =>
        if (v == null) col(c).isNull else col(c) === lit(v)
      }.reduce(_ && _)
      (vals.toSeq, transform(_.filter(pred)))
    }.toMap
  }

  /** The fan-out WRITER over [[partitionByGroups]] — the documented use
    * case made end-to-end: one sink directory per group under
    * `baseDir/<col>=<value>/...`, values escaped with SPARK'S OWN
    * partition-path escaping (ExternalCatalogUtils.escapePathName:
    * %XX for separators/metachars, space literal, null →
    * __HIVE_DEFAULT_PARTITION__), so the tree round-trips through
    * `spark.read.parquet(baseDir)` partition discovery — URL-encoding
    * would turn 'new york' into 'new+york' and discovery would read
    * the '+' back as data. Returns group key → written path.
    *
    * Scale contract: each member is a lazy filter over the shared
    * source, so the group's equality predicate reaches the scan as
    * PushedFilters (and prunes partitions when the source is laid out
    * by the key) — pinned in PlanAuditSpec. The members still write
    * SERIALLY, one job per group, re-scanning the source unless the
    * layout prunes; for a homogeneous one-format layout prefer
    * `df.write.partitionBy(cols)` — ONE pass producing the same
    * directory shape. This helper is for when groups need distinct
    * treatment (per-group format/options/post-processing) and the
    * group count is small — the same loud `maxGroups` cap applies. */
  def writeByGroups(
      cols: Seq[String], baseDir: String,
      format: String = "parquet", mode: String = "overwrite",
      maxGroups: Int = 1000): Map[Seq[Any], String] = {
    partitionByGroups(cols, maxGroups).map { case (vals, g) =>
      import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      val dirName = cols.zip(vals).map { case (c, v) =>
        c + "=" + Option(v).map(x =>
          ExternalCatalogUtils.escapePathName(x.toString))
          .getOrElse(ExternalCatalogUtils.DEFAULT_PARTITION_NAME)
      }.mkString("/")
      val path = s"$baseDir/$dirName"
      g.df.write.mode(mode).format(format).save(path)
      (vals, path)
    }
  }

  /** Cumulative-budget cut per stratum on the wrapper
    * (Sampling.budgetPerStratum): keep rows in `order` until the
    * stratum's running `weightCol` total passes `budget` — the
    * "at most N tokens per language" balancer. Appends the running
    * total as `cum_<weightCol>` (a new value_var). */
  def budgetPerStratum(
      stratum: Column, order: Seq[Column], weightCol: String, budget: Long): GDataset =
    transform(graft.operators.Sampling
      .budgetPerStratum(_, stratum, order, weightCol, budget))

  /** polars rolling_map on the wrapper: generic bounded-window kernel
    * over `c` per id-var group in index order (Relational.rollingMap
    * — the kernel is a Column expression over the window array, so
    * the whole pass stays codegen'd). */
  def rollingMap(c: String, n: Int, out: String)(kernel: Column => Column): GDataset =
    transform(graft.queries.Relational.rollingMap(
      _, idVars.map(col), Seq(col(index)), c, n, out)(kernel))

  /** polars cut(breaks, labels=, left_closed=) on the wrapper
    * (Binning.cut): fixed-break binning as a scan-local codegen'd
    * when-chain; the label column is a new value_var. */
  def cut(c: String, breaks: Seq[Double], labels: Seq[String] = Nil,
      leftClosed: Boolean = false, out: String = "bin"): GDataset =
    transform(graft.operators.Binning.cut(_, c, breaks, labels, leftClosed, out))

  /** polars qcut(quantiles, labels=, left_closed=) on the wrapper
    * (Binning.qcut): exact-quantile breaks — distributed range
    * partitioning, one broadcast join back — then the same scan-local
    * when-chain; optionally per group. */
  def qcut(c: String, quantiles: Seq[Double], labels: Seq[String] = Nil,
      leftClosed: Boolean = false, groupCols: Seq[String] = Nil,
      out: String = "bin"): GDataset =
    transform(graft.operators.Binning.qcut(_, c, quantiles, labels, leftClosed, groupCols, out))

  /** polars fill_null(strategy="mean"/"median") on the wrapper,
    * optionally per group (Relational.fillNullStrategy — grouped mean
    * is one window; global statistics broadcast; median reuses the
    * distributed exact-quantile machinery). */
  def fillNullStrategy(c: String, strategy: String,
      groupCols: Seq[String] = Nil): GDataset =
    transform(graft.queries.Relational.fillNullStrategy(_, c, strategy, groupCols))

  /** polars list.eval on the wrapper: element-wise expression over a
    * list column via the scan-local `transform` HOF; `f` receives the
    * `pl.element()` stand-in. Companions [[listEvalFilter]] /
    * [[listEvalReduce]] cover the predicate and fold shapes. */
  def listEval(listCol: String, out: String)(f: Column => Column): GDataset =
    transform(graft.queries.Relational.listEval(_, listCol, out)(f))

  def listEvalFilter(listCol: String, out: String)(p: Column => Column): GDataset =
    transform(graft.queries.Relational.listEvalFilter(_, listCol, out)(p))

  def listEvalReduce(listCol: String, out: String, zero: Column)(
      merge: (Column, Column) => Column): GDataset =
    transform(graft.queries.Relational.listEvalReduce(_, listCol, out, zero)(merge))

  /** head/tail/slice over an explicit total order (polars slice is
    * positional; a distributed engine needs the order spelled out). */
  def slice(sortCols: Seq[Column], offset: Int, n: Int): GDataset =
    transform(_.orderBy(sortCols: _*).offset(offset).limit(n))

  def head(sortCols: Seq[Column], n: Int): GDataset = slice(sortCols, 0, n)

  /** Global 0-based row index in the DataFrame's current order (polars
    * with_row_index). Two passes like RDD zipWithIndex — count rows per
    * partition, then offset — but DataFrame-native end to end: the id
    * expression encodes (partition, local position) in one codegen'd
    * long, the per-partition counts aggregate map-side to #partitions
    * rows, and the offsets come back via a broadcast join, so rows are
    * never deserialized out of columnar batches. No single-partition
    * bottleneck; indices contiguous (unlike raw
    * monotonically_increasing_id). Deterministic when the plan ends in
    * a sort (range-partitioned output preserves global order across
    * partitions). */
  def withRowIndex(name: String = "row_index", deterministicSource: Boolean = false): GDataset = transform { d =>
    // zipWithIndex at the RDD layer — the one place the engine drops
    // below DataFrames, because the operator NEEDS a fixed partition
    // lineage: `queryExecution.toRdd` finalizes the physical plan
    // (AQE included) ONCE, so the count job and the offset-map job
    // provably see the same layout. The previous formulation ran two
    // DataFrame actions (an eager per-partition count, then the
    // offset join) and trusted the layouts to match; the r10
    // sf1-equivalent stress caught AQE coalescing the two actions'
    // shuffle reads differently at scale — the pid-keyed inner join
    // then silently DROPPED every row of an unmatched partition
    // (459716 of 1.5M rows survived). An RDD's partitions are
    // computed once and cached on the object, and its shuffle stages
    // are reused across the two jobs, so the mismatch is impossible
    // by construction — the same guarantee RDD.zipWithIndex has
    // always documented.
    //
    // By default the input is persisted first so a NONDETERMINISTIC
    // upstream (sampling, in-batch ids) yields the same rows to both
    // jobs; the cache entry lives until spark.catalog.clearCache().
    // `deterministicSource = true` is the caller's assertion that
    // recomputing the plan yields identical rows (parquet scan +
    // deterministic narrow ops / sort): then no full-input copy is
    // materialized — at 100 TB re-reading beats caching — and
    // post-shuffle stages still reuse their shuffle files.
    val src =
      if (deterministicSource) d
      else {
        // persist, then rebuild a fresh Dataset over the SAME plan: if a
        // prior action already forced d.queryExecution before this call,
        // that QueryExecution was planned without cache substitution and
        // persisting d would silently no-op for toRdd below. A fresh
        // Dataset re-runs withCachedData at planning time, so both
        // zipWithIndex jobs provably read through the cache.
        d.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        d.select(col("*"))
      }
    val types = d.schema.fields.map(_.dataType)
    val indexed = src.queryExecution.toRdd.zipWithIndex().mapPartitions { it =>
      it.map { case (row, idx) =>
        val r = row.copy() // unsafe rows are reused per input batch
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          (idx.asInstanceOf[Any] +: types.indices.map(i => r.get(i, types(i)))).toArray)
          : org.apache.spark.sql.catalyst.InternalRow
      }
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(name,
        org.apache.spark.sql.types.LongType, nullable = false) +: d.schema.fields)
    org.apache.spark.sql.GraftShim.internalCreateDataFrame(d.sparkSession, indexed, schema)
  }

  /** Horizontal concat. polars hstack aligns by row position — at scale
    * the only well-defined alignment is by key, so this joins on the
    * shared metadata columns (id_vars ∩ + index), outer by default so
    * neither side drops rows (polars_dataset.py join usage; README
    * hstack-by-index). */
  def hconcat(other: GDataset, joinType: String = "full_outer"): GDataset = {
    require(index == other.index, "hconcat requires the same index")
    // a shared value-var name would survive the join as two identically
    // named columns, making every later reference ambiguous
    val shared = valueVars.intersect(other.valueVars)
    require(shared.isEmpty,
      s"hconcat value columns collide: ${shared.mkString(", ")} — rename one side")
    val keys = (idVars.intersect(other.idVars) :+ index).distinct
    join(other, keys, joinType)
  }

  private def numericValueVars: Seq[String] = valueVars.filter { v =>
    df.schema(v).dataType.isInstanceOf[NumericType]
  }

  /** Per-group series transform core shared by regrid/dft: shuffles once
    * on id_vars (a group = one series, small by construction; parallelism
    * = #groups, which at 100 TB vastly exceeds the executor count), sorts
    * each group by the index in memory, and emits derived rows.
    */
  private def perGroupSeries(
      outValueNames: Seq[String],
      emit: (Array[Double], Array[Array[Double]]) => Iterator[(Double, Array[Double])],
      outIndexName: String,
      dedupIndex: Boolean = true): GDataset = {
    val ids = prunedIdVars
    val vars = numericValueVars
    val sel = df.select(
      ids.map(col) ++ Seq(col(index).cast("double").as(index)) ++
        vars.map(v => col(v).cast("double").as(v)): _*)
    val nIds = ids.length
    val keySchema =
      if (ids.isEmpty) StructType(Seq(StructField("__g", IntegerType, nullable = false)))
      else StructType(ids.map(sel.schema.apply))
    val outSchema = StructType(
      ids.map(sel.schema.apply) ++
        (StructField(outIndexName, DoubleType) +: outValueNames.map(StructField(_, DoubleType))))
    val keyEnc = Encoders.row(keySchema)
    val outEnc = Encoders.row(outSchema)
    val result = sel
      .groupByKey { r =>
        if (nIds == 0) Row(0) else Row.fromSeq((0 until nIds).map(r.get))
      }(keyEnc)
      .flatMapGroups { (key: Row, rows: Iterator[Row]) =>
        val keyVals: Seq[Any] = if (nIds == 0) Nil else key.toSeq
        val pts = rows
          .filterNot(_.isNullAt(nIds))
          .toArray
          .sortBy(_.getDouble(nIds))
        // spline/DFT need strictly-increasing x (on duplicates keep the
        // last observation); row-wise ops (ewm) keep every row
        val kept = scala.collection.mutable.ArrayBuffer.empty[Row]
        pts.foreach { r =>
          if (dedupIndex && kept.nonEmpty && kept.last.getDouble(nIds) == r.getDouble(nIds))
            kept(kept.length - 1) = r
          else kept += r
        }
        val xs = kept.map(_.getDouble(nIds)).toArray
        val series = Array.tabulate(vars.length) { vi =>
          kept.map(r => if (r.isNullAt(nIds + 1 + vi)) Double.NaN else r.getDouble(nIds + 1 + vi)).toArray
        }
        emit(xs, series).map { case (x, vals) =>
          Row.fromSeq(keyVals ++ (x +: vals.toSeq))
        }
      }(outEnc)
    GDataset(result, outIndexName, ids)
  }

  /** Struct value vars flattened to `name__field` columns for the
    * per-group series ops (reference polars_dataset.py:240-253 —
    * `_unnest_structs` with prefixed names; `__` instead of `.` so no
    * identifier quoting is needed), plus the map to rebuild them. */
  private def unnestForSeries: (GDataset, Seq[(String, Seq[String])]) = {
    val structs = valueVars.filter(v => df.schema(v).dataType.isInstanceOf[StructType])
    if (structs.isEmpty) (this, Nil)
    else {
      val smap = structs.map(v =>
        v -> df.schema(v).dataType.asInstanceOf[StructType].fieldNames.toSeq)
      val flat = df.schema.fields.toSeq.flatMap { f =>
        if (structs.contains(f.name))
          f.dataType.asInstanceOf[StructType].fieldNames.toSeq
            .map(fn => col(s"${f.name}.$fn").as(s"${f.name}__$fn"))
        else Seq(col(f.name))
      }
      (GDataset(df.select(flat: _*), index, idVars), smap)
    }
  }

  /** Inverse of [[unnestForSeries]] (polars_dataset.py:255-263). */
  private def rebuildStructs(smap: Seq[(String, Seq[String])]): GDataset =
    if (smap.isEmpty) this
    else transform { d =>
      smap.foldLeft(d) { case (acc, (name, fields)) =>
        acc
          .withColumn(name, struct(fields.map(fn => col(s"${name}__$fn").as(fn)): _*))
          .drop(fields.map(fn => s"${name}__$fn"): _*)
      }
    }

  /** Cubic-spline resample of every numeric value var onto `grid`, per
    * id_vars group (reference polars_dataset.py:212-238; spline math in
    * [[graft.functions.Interpolation.cubicSpline]]). Struct value vars
    * are unnested, splined per field, and rebuilt — the reference's
    * struct round-trip. */
  def regrid(grid: Array[Double]): GDataset = regrid(grid, SplineOptions())

  /** Regrid with explicit spline options — boundary condition and
    * extrapolation mode (the reference forwards `**kwargs` to its
    * spline plugin, polars_dataset.py:212; [[graft.functions.SplineOptions]]
    * is that surface here). */
  def regrid(grid: Array[Double], opts: SplineOptions): GDataset = {
    val (flat, smap) = unnestForSeries
    flat.regridFlat(grid, opts).rebuildStructs(smap)
  }

  /** Regrid along an arbitrary axis. When `axis` is an id_var the index
    * is swapped into the grouping keys and the spline runs over the
    * id_var instead (reference polars_dataset.py:219-223); the returned
    * dataset keeps the ORIGINAL index/id_vars metadata — only the axis
    * column now holds grid values. */
  def regrid(grid: Array[Double], axis: String): GDataset =
    if (axis == index) regrid(grid)
    else {
      require(idVars.contains(axis),
        s"regrid axis `$axis` must be the index or an id_var")
      val swapped = GDataset(df, axis, idVars.filterNot(_ == axis) :+ index)
      GDataset(swapped.regrid(grid).df, index, idVars).sortColumns
    }

  private def regridFlat(grid: Array[Double], opts: SplineOptions): GDataset = {
    val vars = numericValueVars
    perGroupSeries(
      vars,
      (xs, series) => {
        val splined = series.map(ys => Interpolation.cubicSpline(xs, ys, grid, opts))
        grid.indices.iterator.map(gi => (grid(gi), splined.map(_(gi))))
      },
      index)
  }

  private def seriesWindowAsc(tieBreak: Seq[Column]) =
    org.apache.spark.sql.expressions.Window
      .partitionBy(prunedIdVars.map(col): _*)
      .orderBy(col(index) +: tieBreak: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)

  private def seriesWindowDesc(tieBreak: Seq[Column]) =
    org.apache.spark.sql.expressions.Window
      .partitionBy(prunedIdVars.map(col): _*)
      .orderBy((col(index) +: tieBreak).map(_.desc): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)

  /** Forward-fill nulls per id_vars group in index order (polars
    * fill_null(strategy="forward")): one window pass, no self-join. */
  def ffill(valueCols: Seq[String], tieBreak: Seq[Column] = Nil): GDataset =
    transform { d =>
      valueCols.foldLeft(d) { (acc, v) =>
        acc.withColumn(v, last(col(v), ignoreNulls = true).over(seriesWindowAsc(tieBreak)))
      }
    }

  /** Backward-fill (polars fill_null(strategy="backward")). */
  def bfill(valueCols: Seq[String], tieBreak: Seq[Column] = Nil): GDataset =
    transform { d =>
      valueCols.foldLeft(d) { (acc, v) =>
        acc.withColumn(v, last(col(v), ignoreNulls = true).over(seriesWindowDesc(tieBreak)))
      }
    }

  /** Regular-grid resample rows per id_vars group — polars `upsample`
    * (forwarded surface, polars_dataset.py:61-78): every `step` index
    * units between each group's min and max index gets a row; values
    * come from originals that land EXACTLY on a grid point, all other
    * grid rows are null — polars' grid-left join, where off-grid
    * originals are dropped (`keepOffGrid = true` keeps them instead,
    * via a full outer join — the variant that feeds [[interpolate]]
    * without losing observations). The index must cast to long (epoch
    * seconds/micros or an integer axis) so grid points join on exact
    * integer equality — a float grid would drift off the originals.
    *
    * The grid is generated in bounded chunks (≤4096 points per
    * exploded array), so a month-long µs-index span at a small step
    * cannot materialize one giant per-group array (Spark `sequence`
    * caps at 2^31 elements and a single wide row OOMs long before
    * that); one extrema aggregation, no driver loop. */
  def upsample(step: Long, keepOffGrid: Boolean = false): GDataset = {
    require(step > 0, "step must be positive")
    val ids = prunedIdVars
    transform { d =>
      val longIdx = d.withColumn(index, col(index).cast("long"))
      val chunk = 4096L
      val span = lit(step * chunk)
      val extrema = longIdx
        .groupBy(ids.map(col): _*)
        .agg(min(col(index)).as("__mn"), max(col(index)).as("__mx"))
      val grid = extrema
        .select((ids.map(col) :+ col("__mn") :+ col("__mx") :+
          explode(sequence(
            lit(0L),
            ((col("__mx") - col("__mn")) / span).cast("long"))).as("__chunk")): _*)
        .select(ids.map(col) :+
          explode(sequence(
            col("__mn") + col("__chunk") * span,
            least(col("__mn") + (col("__chunk") + 1) * span - step, col("__mx")),
            lit(step))).as(index): _*)
      grid.join(longIdx, ids :+ index, if (keepOffGrid) "full_outer" else "left_outer")
    }
  }

  /** Interpolation of nulls over the index per id_vars group (polars
    * `interpolate`): strategy "linear" gives nulls between two
    * observations the line through them; "nearest" copies the closer
    * neighbor's value (ties and duplicate-index neighbors resolve
    * backward, to the previous observation). Leading/trailing nulls
    * stay null either way. Two window passes, no self-join — shuffles
    * once on id_vars. */
  def interpolate(
      valueCols: Seq[String],
      tieBreak: Seq[Column] = Nil,
      strategy: String = "linear"): GDataset =
    transform { d =>
      require(strategy == "linear" || strategy == "nearest",
        s"unknown interpolate strategy '$strategy' (linear | nearest)")
      val wb = seriesWindowAsc(tieBreak)
      val wf = seriesWindowDesc(tieBreak)
      val x = col(index).cast("double")
      valueCols.foldLeft(d) { (acc, vName) =>
        val v = col(vName)
        val pv = last(v, ignoreNulls = true).over(wb)
        val px = last(when(v.isNotNull, x), ignoreNulls = true).over(wb)
        val nv = last(v, ignoreNulls = true).over(wf)
        val nx = last(when(v.isNotNull, x), ignoreNulls = true).over(wf)
        val filled =
          if (strategy == "nearest") when((x - px) <= (nx - x), pv).otherwise(nv)
          else
            // both neighbors at the same x (duplicate index): the slope
            // divide would be null/NaN, but either value is consistent
            when(nx === px, pv)
              .otherwise(pv + (nv - pv) * ((x - px) / (nx - px)))
        acc.withColumn(vName,
          when(v.isNotNull, v)
            .when(pv.isNull || nv.isNull, lit(null))
            .otherwise(filled))
      }
    }

  /** polars merge_sorted analogue (the reference forwards it to polars
    * via polars_dataset.py:74-78): merge two frames, each sorted on
    * `key`, into one frame globally sorted on `key`; rows with equal
    * keys keep this-before-other order (polars' streaming-merge tie
    * rule, made explicit here with a source tag the sort consumes).
    * At 100 TB a distributed range-partitioned re-sort IS the merge —
    * a literal k-way merger would serialize the corpus through one
    * task; Spark's range exchange + per-partition sort does the same
    * comparisons in parallel. */
  def mergeSorted(other: GDataset, key: String): GDataset = {
    require(other.df.columns.toSet == df.columns.toSet,
      s"merge_sorted requires identical schemas; " +
        s"left-only: ${(df.columns.toSet -- other.df.columns.toSet).mkString(", ")} " +
        s"right-only: ${(other.df.columns.toSet -- df.columns.toSet).mkString(", ")}")
    require(df.columns.contains(key), s"unknown merge key `$key`")
    val merged = df.withColumn("__src", lit(0))
      .unionByName(other.df.withColumn("__src", lit(1)))
      .orderBy(col(key), col("__src"))
      .drop("__src")
    GDataset(merged, index, prunedIdVars)
  }

  /** polars pivot analogue (reference polars_dataset.py:150-151; the
    * reference, too, returns a raw frame — metadata rarely survives a
    * pivot). Distinct pivot values are explicit so no extra pass scans
    * for them at 100 TB; `first` matches polars' default aggregate. */
  def pivot(rowKeys: Seq[String], colKey: String, value: String,
      pivotValues: Seq[Any]): DataFrame =
    df.groupBy(rowKeys.map(col): _*)
      .pivot(colKey, pivotValues)
      .agg(first(col(value)))

  /** Exponentially weighted mean (polars ewm_mean, adjust=true) of
    * every numeric value var, per id_vars group, in index order — the
    * exact O(n) recurrence num_t = x_t + (1-α)·num_{t-1} (den likewise)
    * inside the per-group series kernel, so arbitrarily long series
    * work: the window-sum formulation (q_ewm) overflows its w^(-rn)
    * weights past ~6500 rows/group. Row-wise like polars: duplicate
    * index values all contribute (no coordinate dedup), and a null
    * observation is skipped (polars ignore_nulls=true) — the weights
    * don't advance and the previous mean carries forward (NaN only
    * before the first observation). Parallelism = #groups, same unit
    * as regrid/dft. */
  def ewm(alpha: Double): GDataset = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val vars = numericValueVars
    val w = 1.0 - alpha
    perGroupSeries(
      vars.map(v => s"ewm_$v"),
      (xs, series) => {
        val nums = series.map(_ => 0.0)
        val dens = series.map(_ => 0.0)
        xs.indices.iterator.map { i =>
          val vals = Array.tabulate(series.length) { vi =>
            val x = series(vi)(i)
            if (!x.isNaN) {
              nums(vi) = x + w * nums(vi)
              dens(vi) = 1.0 + w * dens(vi)
            }
            if (dens(vi) == 0.0) Double.NaN else nums(vi) / dens(vi)
          }
          (xs(i), vals)
        }
      },
      index,
      dedupIndex = false)
  }

  /** Exponentially weighted variance (polars `ewm_var`, adjust=true):
    * the same exact O(n) recurrence family as [[ewm]] extended to four
    * running sums — a0 = Σw^(t-k), a1 = Σw^(t-k)x, a2 = Σw^(t-k)x²,
    * b = Σw^(2(t-k)) — so arbitrarily long series never overflow the
    * w^(-rn) weights a window-sum formulation needs (q_ewm_std is that
    * SQL-expressible check at the events scale). `bias = false` (the
    * polars/pandas default) applies the standard a0²/(a0²−b) debias;
    * the first observation is NaN there (ddof=1 undefined) and 0.0
    * when biased — pandas-pinned in GDatasetSpec. Nulls are skipped
    * like [[ewm]]: weights don't advance, prior moment carries. */
  def ewmVar(alpha: Double, bias: Boolean = false): GDataset =
    ewmMoment(alpha, bias, std = false)

  /** Exponentially weighted standard deviation (polars `ewm_std`):
    * sqrt of [[ewmVar]], same recurrence pass. */
  def ewmStd(alpha: Double, bias: Boolean = false): GDataset =
    ewmMoment(alpha, bias, std = true)

  /** Time-decayed exponentially weighted mean (polars `ewm_mean_by`):
    * weights decay with ELAPSED index distance — 0.5^(Δx / halfLife) —
    * not row count, which is what an irregular series needs. With
    * `adjust = true` (default) this is the weighted-sum form
    * mean_i = Σ_k 0.5^((x_i−x_k)/h)·v_k / Σ_k 0.5^((x_i−x_k)/h)
    * (pandas `ewm(times=…, halflife=…)`), computed by the exact O(n)
    * recurrence a_i = v_i + 0.5^(Δ_i/h)·a_{i−1} so unbounded series
    * never overflow (q_ewm_by is the bounded-range window-sum SQL
    * check). With `adjust = false` it is the recursive
    * y_i = α_i·v_i + (1−α_i)·y_{i−1}, α_i = 1 − 0.5^(Δ_i/h) — the
    * polars `ewm_mean_by` recurrence. A timestamp index casts to epoch
    * seconds, so `halfLife` is in seconds there. Null values skip like
    * [[ewm]]: weights don't advance, the prior mean carries. */
  def ewmMeanBy(halfLife: Double, adjust: Boolean = true): GDataset = {
    require(halfLife > 0, "halfLife must be positive")
    val vars = numericValueVars
    perGroupSeries(
      vars.map(v => s"ewm_by_$v"),
      (xs, series) => {
        val num = series.map(_ => 0.0)
        val den = series.map(_ => 0.0)
        val lastX = series.map(_ => Double.NaN)
        val y = series.map(_ => Double.NaN)
        xs.indices.iterator.map { i =>
          val vals = Array.tabulate(series.length) { vi =>
            val x = series(vi)(i)
            if (!x.isNaN) {
              val decay =
                if (lastX(vi).isNaN) 0.0
                else math.pow(0.5, (xs(i) - lastX(vi)) / halfLife)
              if (adjust) {
                num(vi) = x + decay * num(vi)
                den(vi) = 1.0 + decay * den(vi)
                y(vi) = num(vi) / den(vi)
              } else {
                y(vi) = if (y(vi).isNaN) x else (1.0 - decay) * x + decay * y(vi)
              }
              lastX(vi) = xs(i)
            }
            y(vi)
          }
          (xs(i), vals)
        }
      },
      index,
      dedupIndex = false)
  }

  private def ewmMoment(alpha: Double, bias: Boolean, std: Boolean): GDataset = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val vars = numericValueVars
    val w = 1.0 - alpha
    val prefix = if (std) "ewm_std_" else "ewm_var_"
    perGroupSeries(
      vars.map(v => s"$prefix$v"),
      (xs, series) => {
        val a0 = series.map(_ => 0.0)
        val a1 = series.map(_ => 0.0)
        val a2 = series.map(_ => 0.0)
        val b = series.map(_ => 0.0)
        val n = series.map(_ => 0)
        xs.indices.iterator.map { i =>
          val vals = Array.tabulate(series.length) { vi =>
            val x = series(vi)(i)
            if (!x.isNaN) {
              a0(vi) = 1.0 + w * a0(vi)
              a1(vi) = x + w * a1(vi)
              a2(vi) = x * x + w * a2(vi)
              b(vi) = 1.0 + w * w * b(vi)
              n(vi) += 1
            }
            val v =
              if (n(vi) == 0) Double.NaN
              else {
                val mean = a1(vi) / a0(vi)
                // clamp the catastrophic-cancellation negatives of a
                // constant series to an exact 0
                val vb = math.max(a2(vi) / a0(vi) - mean * mean, 0.0)
                if (bias) vb
                else if (n(vi) < 2) Double.NaN
                else vb * a0(vi) * a0(vi) / (a0(vi) * a0(vi) - b(vi))
              }
            if (std) math.sqrt(v) else v
          }
          (xs(i), vals)
        }
      },
      index,
      dedupIndex = false)
  }

  /** Arbitrary per-group series transform — the reference's
    * `group_by(...).map_groups(...)` power (polars_dataset.py:225-229)
    * as a public, typed hook: `emit` receives each group's index-sorted
    * coordinates `xs` and one value array per numeric value var
    * (missing observations as NaN), and returns derived (x, values)
    * rows. regrid/dft/ewm are this operator with fixed kernels; any
    * other per-series computation (resample-then-aggregate, custom
    * smoothing, z-scoring) plugs in the same way. Shuffles once on
    * id_vars; parallelism = #groups, so at 100 TB the group count —
    * not the kernel — is the scale unit. A group must fit an executor
    * (same contract as polars map_groups on a partitioned frame).
    *
    * @param outValueNames output column name per emitted value slot
    * @param outIndexName  name of the emitted coordinate column
    * @param dedupIndex    collapse duplicate index values (keep last)
    *                      before calling `emit`, as spline/DFT require;
    *                      false = row-wise kernels see every row */
  def mapGroupsSeries(
      outValueNames: Seq[String],
      outIndexName: String = index,
      dedupIndex: Boolean = true)(
      emit: (Array[Double], Array[Array[Double]]) => Iterator[(Double, Array[Double])]): GDataset =
    perGroupSeries(outValueNames, emit, outIndexName, dedupIndex)

  /** Magnitude spectrum (first `k` DFT bins) of every numeric value var,
    * per id_vars group, over the index-ordered series (README "Fourier
    * transform" capability). Output index column is `freq_bin`. */
  def dft(k: Int): GDataset = {
    val vars = numericValueVars
    perGroupSeries(
      vars.map(v => s"mag_$v"),
      (_, series) => {
        val mags = series.map(ys => Interpolation.dftMagnitudes(ys, k))
        val nBins = if (mags.isEmpty) 0 else mags.map(_.length).min
        (0 until nBins).iterator.map(b => (b.toDouble, mags.map(_(b))))
      },
      "freq_bin")
  }
}

object GDataset {

  def apply(df: DataFrame, index: String): GDataset = GDataset(df, index, Nil)

  /** Mixed-input concat — the reference `__init__` accepts a
    * heterogeneous list of Dataset/DataFrame/LazyFrame members
    * (polars_dataset.py:42-59); here raw DataFrames are wrapped with
    * the supplied metadata before the same strict column checks run. */
  def concat(index: String, idVars: Seq[String], members: Seq[Either[GDataset, DataFrame]]): GDataset =
    concat(members.map {
      case Left(ds)  => ds
      case Right(df) => GDataset(df, index, idVars)
    })

  /** Multi-dataset concat: all must share the index; id_vars are
    * unioned; columns aligned by name (polars_dataset.py:20-40).
    * Spark's unionByName with missing-column nulls is the distributed
    * analogue of polars' diagonal-ish concat over the shared schema. */
  def concat(datasets: Seq[GDataset]): GDataset = {
    require(datasets.nonEmpty, "concat of zero datasets")
    val indexes = datasets.map(_.index).distinct
    require(indexes.size == 1, "All datasets must have the same index")
    val idVars = datasets.flatMap(_.idVars).distinct
    // reference polars_dataset.py:36-40: every member must carry every
    // id_var and the index — a silent null-fill of a KEY column would
    // corrupt group identities; value columns still align by name
    val required = idVars :+ indexes.head
    datasets.foreach { d =>
      val missing = required.filterNot(d.df.columns.contains)
      require(missing.isEmpty,
        s"Missing column(s): ${missing.mkString(", ")}. " +
          s"All datasets must contain: ${required.mkString(", ")}.")
    }
    val unioned = datasets.map(_.df).reduce(_.unionByName(_, allowMissingColumns = true))
    GDataset(unioned, indexes.head, idVars.filter(unioned.columns.contains)).sortColumns
  }
}
