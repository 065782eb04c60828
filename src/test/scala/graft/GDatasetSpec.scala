package graft

import org.apache.spark.sql.functions._
import graft.core.{Datafile, GDataset}

class GDatasetSpec extends SparkSpec {

  private def events = Tables.t(spark, Sf, "events")

  test("index must exist") {
    assertThrows[IllegalArgumentException](GDataset(events, "nope", Nil))
  }

  test("valueVars excludes index and idVars") {
    val ds = GDataset(events, "ts", Seq("user_id"))
    assert(ds.valueVars.toSet == Set("event_id", "event_type", "value", "props"))
  }

  test("apply returns the column as an expression bound to this dataset") {
    val ds = GDataset(events, "ts", Seq("user_id"))
    val n = ds.df.filter(ds("value") >= 0).count()
    assert(n == ds.df.filter(col("value") >= 0).count())
  }

  test("transform preserving index keeps metadata, prunes dropped idVars") {
    val ds = GDataset(events, "ts", Seq("user_id"))
    val out = ds.transform(_.drop("user_id"))
    assert(out.idVars.isEmpty && out.index == "ts")
  }

  test("transform dropping index errors") {
    val ds = GDataset(events, "ts", Seq("user_id"))
    assertThrows[IllegalArgumentException](ds.transform(_.drop("ts")))
  }

  test("drop protects the index") {
    val ds = GDataset(events, "ts", Nil)
    assertThrows[IllegalArgumentException](ds.drop("ts"))
  }

  test("rename remaps metadata") {
    val ds = GDataset(events, "ts", Seq("user_id"))
      .rename(Map("ts" -> "t", "user_id" -> "uid"))
    assert(ds.index == "t" && ds.idVars == Seq("uid"))
    assert(ds.df.columns.contains("t"))
  }

  test("sortColumns puts idVars, index first") {
    val ds = GDataset(events, "ts", Seq("user_id")).sortColumns
    assert(ds.df.columns.take(2).toSeq == Seq("user_id", "ts"))
  }

  test("concat requires same index") {
    val a = GDataset(events, "ts", Nil)
    val b = GDataset(events.withColumnRenamed("ts", "t"), "t", Nil)
    assertThrows[IllegalArgumentException](GDataset.concat(Seq(a, b)))
  }

  test("concat unions idVars and aligns missing value columns") {
    // value columns align by name (missing side null-filled)…
    val a = GDataset(events.select(col("ts"), col("user_id"), col("value")),
      "ts", Seq("user_id"))
    val b = GDataset(events.select(col("ts"), col("user_id"), col("value"),
      col("event_type")), "ts", Seq("user_id"))
    val c = GDataset.concat(Seq(a, b))
    assert(c.idVars == Seq("user_id"))
    assert(c.df.count() == 2 * events.count())
    // …but a member missing a KEY column (an id_var of the union) errors
    // (reference polars_dataset.py:36-40 ColumnNotFoundError)
    val noKey = GDataset(events.select(col("ts"), col("value")), "ts", Nil)
    val err = intercept[IllegalArgumentException](GDataset.concat(Seq(noKey, b)))
    assert(err.getMessage.contains("user_id"))
  }

  test("coord returns uniques in first-appearance order; extrema returns min/max") {
    // polars unique(maintain_order=True) parity: the value first seen
    // earliest in frame order comes first, NOT sorted order
    import spark.implicits._
    val df = Seq((1L, "c"), (2L, "a"), (3L, "c"), (4L, "b"), (5L, "a"))
      .toDF("ts", "k").coalesce(1)
    val ks = GDataset(df, "ts", Nil).coord("k").collect().map(_.getString(0)).toSeq
    assert(ks == Seq("c", "a", "b"), s"appearance order broken: $ks")

    val ds = GDataset(events, "ts", Seq("user_id"))
    val ids = ds.coord("user_id").collect().map(_.getLong(0)).toSeq
    assert(ids.distinct == ids && ids.toSet == events.select("user_id")
      .distinct().collect().map(_.getLong(0)).toSet)
    val (mn, mx) = ds.extrema("value")
    assert(mn.asInstanceOf[Double] <= mx.asInstanceOf[Double])
  }

  test("upsample emits grid rows polars-style; keepOffGrid retains off-grid originals") {
    import spark.implicits._
    val df = Seq((1L, 0L, 1.0), (1L, 100L, 2.0), (1L, 7200L, 3.0), (2L, 50L, 9.0))
      .toDF("k", "x", "v")
    def collect(ds: GDataset) = ds.df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    // polars parity: grid {0, 3600, 7200}; the off-grid row at 100 drops
    val polars = collect(GDataset(df, "x", Seq("k")).upsample(3600L))
    assert(polars.keySet == Set((1L, 0L), (1L, 3600L), (1L, 7200L), (2L, 50L)))
    assert(polars((1L, 3600L)) == null, "inserted grid row must carry a null value")
    assert(polars((1L, 0L)) == 1.0 && polars((1L, 7200L)) == 3.0 && polars((2L, 50L)) == 9.0)
    // the interpolate-feeding variant keeps the observation at 100
    val kept = collect(GDataset(df, "x", Seq("k")).upsample(3600L, keepOffGrid = true))
    assert(kept.keySet == polars.keySet + ((1L, 100L)))
    assert(kept((1L, 100L)) == 2.0)
  }

  test("upsample chunks long grids instead of one giant per-group array") {
    import spark.implicits._
    // 10001 grid points at step 5 spans three 4096-point chunks
    val df = Seq((1L, 0L, 1.0), (1L, 50000L, 2.0)).toDF("k", "x", "v")
    val out = GDataset(df, "x", Seq("k")).upsample(5L).df
    assert(out.count() == 10001)
    assert(out.select("x").distinct().count() == 10001, "chunk seams duplicated grid points")
  }

  test("mapGroupsSeries runs a custom per-group kernel (z-score)") {
    import spark.implicits._
    val df = Seq(
      (1L, 1.0, 10.0), (1L, 2.0, 20.0), (1L, 3.0, 30.0),
      (2L, 1.0, 5.0), (2L, 2.0, 5.0)
    ).toDF("k", "x", "v")
    val out = GDataset(df, "x", Seq("k"))
      .mapGroupsSeries(Seq("z")) { (xs, series) =>
        val ys = series(0)
        val mean = ys.sum / ys.length
        val sd = math.sqrt(ys.map(y => (y - mean) * (y - mean)).sum / ys.length)
        xs.indices.iterator.map(i => (xs(i), Array(if (sd == 0) 0.0 else (ys(i) - mean) / sd)))
      }
    assert(out.index == "x" && out.idVars == Seq("k"))
    val rows = out.df.collect().map(r => (r.getLong(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(math.abs(rows((1L, 2.0))) < 1e-12)             // center of 10/20/30
    assert(math.abs(rows((1L, 3.0)) - math.sqrt(1.5)) < 1e-12)
    assert(rows((2L, 1.0)) == 0.0 && rows((2L, 2.0)) == 0.0) // zero variance
  }

  test("concat accepts raw DataFrames wrapped with supplied metadata") {
    val a = GDataset(events.select(col("ts"), col("user_id"), col("value")),
      "ts", Seq("user_id"))
    val raw = events.select(col("ts"), col("user_id"), col("value"))
    val c = GDataset.concat("ts", Seq("user_id"), Seq(Left(a), Right(raw)))
    assert(c.idVars == Seq("user_id"))
    assert(c.df.count() == 2 * events.count())
    // a raw member missing the index still errors through the wrap
    assertThrows[IllegalArgumentException](
      GDataset.concat("ts", Nil, Seq(Right(events.drop("ts")))))
  }

  test("dropNan drops rows with NaN in any double column (incl. structs)") {
    import spark.implicits._
    val df = Seq((1.0, 2.0), (Double.NaN, 3.0), (4.0, Double.NaN), (5.0, 6.0))
      .toDF("a", "b").withColumn("i", monotonically_increasing_id())
      .withColumn("s", struct(col("b").as("inner")))
    val ds = GDataset(df, "i", Nil).dropNan
    assert(ds.df.count() == 2)
  }

  test("describe emits one row per numeric value var with exact null counts") {
    import spark.implicits._
    val ds = GDataset(
      Seq((1L, Option(1.0), 10.0), (2L, Option(2.0), 20.0),
        (3L, Option(3.0), 30.0), (4L, Option.empty[Double], 40.0))
        .toDF("i", "a", "b"), "i")
    // (count, null_count, mean, min, max)
    val rows = ds.describe().collect().map(r =>
      r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(5), r.getDouble(6))).toMap
    assert(rows.keySet == Set("a", "b"))
    assert(rows("a") == ((3L, 1L, 2.0, 1.0, 3.0)), "null cell must count, not vanish")
    assert(rows("b") == ((4L, 0L, 25.0, 10.0, 40.0)))
  }

  test("sampleByHash is deterministic and roughly proportional") {
    import spark.implicits._
    val ds = GDataset((1L to 1000L).toDF("i"), "i")
    val n1 = ds.sampleByHash(col("i"), 4).df.count()
    val n2 = ds.sampleByHash(col("i"), 4).df.count()
    assert(n1 == n2)
    assert(n1 > 150 && n1 < 350, s"expected ~250 of 1000, got $n1")
    assert(ds.sampleByHash(col("i"), 0).df.count() == 0)
    assert(ds.sampleByHash(col("i"), 16).df.count() == 1000)
  }

  test("sampleWeighted on the wrapper == the operator draw, metadata preserved") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, if (i <= 50) 20.0 else 1.0)).toDF("i", "w")
    val ds = GDataset(df, "i")
    val viaWrapper = ds.sampleWeighted(col("i"), col("w"), 40)
    assert(viaWrapper.index == "i", "metadata must survive the transform")
    val wrapperIds = viaWrapper.df.select("i").collect().map(_.getLong(0)).toSet
    val operatorIds = graft.operators.Sampling
      .weightedSample(df, col("i"), col("w"), 40)
      .select("i").collect().map(_.getLong(0)).toSet
    assert(wrapperIds == operatorIds)
    assert(wrapperIds.count(_ <= 50L) >= 20, "weights must bias the draw")
  }

  test("partitionByGroups: exact disjoint cover, null group, metadata kept, cap fires") {
    import spark.implicits._
    val df = Seq[(Long, Option[String])](
      (1L, Some("en")), (2L, Some("en")), (3L, Some("fr")), (4L, None))
      .toDF("i", "lang")
    val ds = GDataset(df, "i")
    val parts = ds.partitionByGroups(Seq("lang"))
    assert(parts.keySet == Set(Seq("en"), Seq("fr"), Seq(null)))
    def ids(g: GDataset) = g.df.select("i").collect().map(_.getLong(0)).toSet
    assert(ids(parts(Seq("en"))) == Set(1L, 2L))
    assert(ids(parts(Seq("fr"))) == Set(3L))
    assert(ids(parts(Seq(null))) == Set(4L), "null keys form their own group")
    assert(parts.values.forall(_.index == "i"), "metadata must survive")
    // members stay lazy filter plans over the source (no materialization)
    assert(parts(Seq("en")).df.queryExecution.analyzed.toString.contains("Filter"))
    // disjoint exact cover
    assert(parts.values.map(g => g.df.count()).sum == 4L)
    intercept[IllegalArgumentException](ds.partitionByGroups(Seq("i"), maxGroups = 2))
    intercept[IllegalArgumentException](ds.partitionByGroups(Nil))
  }

  test("partitionByGroups rejects complex-typed keys; writeByGroups writes one sink per group") {
    import spark.implicits._
    val df = Seq[(Long, Option[String])](
      (1L, Some("en")), (2L, Some("en")), (3L, Some("fr")), (4L, None))
      .toDF("i", "lang")
    val ds = GDataset(df, "i")
    // complex key types don't round-trip through lit() — loud, not wrong
    val complexDs = GDataset(
      df.withColumn("arr", org.apache.spark.sql.functions.array(col("i"))), "i")
    val e = intercept[IllegalArgumentException](
      complexDs.partitionByGroups(Seq("arr")))
    assert(e.getMessage.contains("complex type"))
    // fan-out writer: one parquet dir per group, null keyed, round-trips
    val base = java.nio.file.Files.createTempDirectory("graft_wbg").toString
    val written = ds.writeByGroups(Seq("lang"), base)
    assert(written.keySet == Set(Seq("en"), Seq("fr"), Seq(null)))
    assert(written(Seq(null)).endsWith("lang=__HIVE_DEFAULT_PARTITION__"))
    val back = spark.read.parquet(written(Seq("en")))
    assert(back.select("i").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(spark.read.parquet(written.values.toSeq: _*).count() == 4L)
  }

  test("writeByGroups layout round-trips through Spark partition discovery") {
    import spark.implicits._
    // values with a space and a '%' — URLEncoder would write 'new+york'
    // and discovery would read the '+' back as data; Spark's own
    // escapePathName keeps the space literal and %-escapes metachars
    val df = Seq((1L, "new york"), (2L, "new york"), (3L, "a%b"))
      .toDF("i", "city")
    val base = java.nio.file.Files.createTempDirectory("graft_wbg2").toString
    GDataset(df, "i").writeByGroups(Seq("city"), base)
    val disc = spark.read.parquet(base)
    assert(disc.schema.fieldNames.contains("city"),
      s"discovery did not surface the key column: ${disc.schema}")
    val got = disc.select("i", "city").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "new york", 2L -> "new york", 3L -> "a%b"), got.toString)
  }

  test("stratum/rate samplers, budget, fill and list.eval wrappers delegate, metadata kept") {
    import spark.implicits._
    val df = (1L to 300L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", (i % 7 + 1).toDouble)).toDF("i", "s", "w")
    val ds = GDataset(df, "i")
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("i").collect().map(_.getLong(0)).toSet
    val strat = ds.sampleWeightedByStratum(col("i"), col("w"), col("s"), 10)
    assert(strat.index == "i", "metadata must survive the transform")
    assert(ids(strat.df) == ids(graft.operators.Sampling
      .weightedSampleByStratum(df, col("i"), col("w"), col("s"), 10)))
    val rate = ds.sampleWeightedRate(col("i"), col("w"), 0.05)
    assert(ids(rate.df) == ids(graft.operators.Sampling
      .weightedSampleRate(df, col("i"), col("w"), 0.05)))
    val bud = ds.budgetPerStratum(col("s"), Seq(col("i")), "w", 20L)
    assert(bud.valueVars.contains("cum_w"), "running total must land as a value_var")
    assert(ids(bud.df) == ids(graft.operators.Sampling
      .budgetPerStratum(df, col("s"), Seq(col("i")), "w", 20L)))
    // fill + list.eval ergonomics on the wrapper
    val withNulls = GDataset(Seq((1L, Some(2.0)), (2L, None), (3L, Some(4.0)))
      .toDF("i", "v"), "i")
    val filled = withNulls.fillNullStrategy("v", "mean")
    assert(filled.df.orderBy("i").collect().map(_.getDouble(1)).toSeq == Seq(2.0, 3.0, 4.0))
    val lists = GDataset(Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("i", "xs"), "i")
    val ev = lists.listEval("xs", "tx")(x => x * 10)
      .listEvalFilter("tx", "big")(x => x > 15)
      .listEvalReduce("big", "tot", lit(0.0))((a, x) => a + x)
    val row = ev.df.collect().head
    assert(row.getSeq[Double](2) == Seq(10.0, 20.0, 30.0))
    assert(row.getSeq[Double](3) == Seq(20.0, 30.0) && row.getDouble(4) == 50.0)
    assert(ev.valueVars.toSet == Set("xs", "tx", "big", "tot"))
  }

  test("unique keep variants pick the documented winners") {
    import spark.implicits._
    // key a: 3 rows, key b: 1 row, key c: 2 rows
    val ds = GDataset(
      Seq((1L, "a", 10), (2L, "a", 30), (3L, "a", 20), (4L, "b", 5), (5L, "c", 7), (6L, "c", 7))
        .toDF("i", "k", "v"), "i")
    def ids(g: GDataset): Set[Long] = g.df.collect().map(_.getLong(0)).toSet
    // first/last over explicit order (v, i)
    assert(ids(ds.unique(Seq("k"), "first", Seq(col("v"), col("i")))) == Set(1L, 4L, 5L))
    assert(ids(ds.unique(Seq("k"), "last", Seq(col("v"), col("i")))) == Set(2L, 4L, 6L))
    // none: only unrepeated keys survive
    assert(ids(ds.unique(Seq("k"), "none")) == Set(4L))
    // any: one row per key, whichever
    val any = ds.unique(Seq("k"), "any")
    assert(any.df.count() == 3 && any.df.select("k").distinct().count() == 3)
    // default order = frame appearance (monotonic id), helper col dropped
    val first = ds.unique(Seq("k"), "first")
    assert(ids(first) == Set(1L, 4L, 5L))
    assert(first.df.columns.toSet == Set("i", "k", "v"))
    intercept[IllegalArgumentException](ds.unique(Seq("k"), "bogus").df.collect())
  }

  test("slice returns the requested window of the total order") {
    import spark.implicits._
    val ds = GDataset((1L to 100L).toDF("i"), "i")
    val got = ds.slice(Seq(col("i")), offset = 10, n = 5).df.collect().map(_.getLong(0))
    assert(got.toSeq == Seq(11L, 12L, 13L, 14L, 15L))
  }

  test("withRowIndex is contiguous and follows the sort order") {
    import spark.implicits._
    val ds = GDataset(
      Seq(30L, 10L, 20L, 50L, 40L).toDF("i").repartition(3), "i")
    val got = ds.sort().withRowIndex("idx").df
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == Seq((0L, 10L), (1L, 20L), (2L, 30L), (3L, 40L), (4L, 50L)))
  }

  test("withRowIndex deterministic-source fast path skips the persist") {
    // a parquet scan + deterministic sort: the caller asserts stability,
    // the plan must carry NO InMemoryRelation (no full-input cache) and
    // the indices must still come out contiguous in sort order
    val ds = GDataset(
      Tables.t(spark, Sf, "orders").select(col("o_orderkey"), col("o_totalprice")),
      "o_orderkey")
    spark.catalog.clearCache()
    // diff against a pre-snapshot, not isEmpty: the session is shared
    // across suites and another test's localCheckpoint (DedupCluster)
    // can legitimately leave an RDD pinned — only NEW pins are ours
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val fast = ds.sort().withRowIndex("idx", deterministicSource = true).df
    val rows = fast.select(col("idx"), col("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
      "fast path must not cache the input")
    assert(rows.map(_._1).sorted.toSeq == (0L until rows.length).toSeq,
      "indices not contiguous")
    assert(rows.sortBy(_._1).map(_._2).toSeq == rows.map(_._2).sorted.toSeq,
      "index order does not follow the sort order")
    // the default path still pins the input (against nondeterministic
    // upstreams yielding different rows to the two zipWithIndex jobs)
    ds.sort().withRowIndex("idx").df.collect()
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty,
      "default path must pin the input")
    spark.catalog.clearCache()
  }

  test("hconcat outer-joins on shared metadata") {
    import spark.implicits._
    val a = GDataset(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "va"), "k")
    val b = GDataset(Seq((2L, 200.0), (3L, 300.0)).toDF("k", "vb"), "k")
    val out = a.hconcat(b).df.collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, Some(10.0), None), (2L, Some(20.0), Some(200.0)), (3L, None, Some(300.0))))
  }

  test("struct unnest → transform → nest round-trip") {
    import spark.implicits._
    val ds = GDataset(
      Seq((1L, 1.0, "x"), (2L, 2.0, "y")).toDF("i", "a", "b"), "i")
      .nest(Seq("a", "b"), "payload")
    assert(ds.df.schema("payload").dataType.typeName == "struct")
    val back = ds.unnest("payload")
      .withColumns("a" -> (col("a") * 10))
      .nest(Seq("a", "b"), "payload")
      .unnest("payload")
    val rows = back.df.orderBy("i").collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(rows.toSeq == Seq((1L, 10.0, "x"), (2L, 20.0, "y")))
    assertThrows[IllegalArgumentException](ds.nest(Seq("i"), "bad"))
  }

  test("ffill/bfill/interpolate fill series nulls per group") {
    import spark.implicits._
    val df = Seq(
      (1L, 0.0, Some(10.0)), (1L, 1.0, None), (1L, 2.0, None),
      (1L, 3.0, Some(40.0)), (1L, 4.0, None),
      (2L, 0.0, None), (2L, 1.0, Some(5.0))
    ).toDF("k", "x", "v")
    val ds = GDataset(df, "x", Seq("k"))
    def vals(d: GDataset): Seq[(Long, Option[Double])] =
      d.df.orderBy("k", "x").collect().toSeq
        .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(vals(ds.ffill(Seq("v"))) == Seq(
      1L -> Some(10.0), 1L -> Some(10.0), 1L -> Some(10.0),
      1L -> Some(40.0), 1L -> Some(40.0), 2L -> None, 2L -> Some(5.0)))
    assert(vals(ds.bfill(Seq("v"))) == Seq(
      1L -> Some(10.0), 1L -> Some(40.0), 1L -> Some(40.0),
      1L -> Some(40.0), 1L -> None, 2L -> Some(5.0), 2L -> Some(5.0)))
    assert(vals(ds.interpolate(Seq("v"))) == Seq(
      1L -> Some(10.0), 1L -> Some(20.0), 1L -> Some(30.0),
      1L -> Some(40.0), 1L -> None, 2L -> None, 2L -> Some(5.0)))
    // nearest: x=1 is closer to the x=0 observation, x=2 to the x=3
    // one; one-sided nulls stay null like linear
    assert(vals(ds.interpolate(Seq("v"), strategy = "nearest")) == Seq(
      1L -> Some(10.0), 1L -> Some(10.0), 1L -> Some(40.0),
      1L -> Some(40.0), 1L -> None, 2L -> None, 2L -> Some(5.0)))
    assertThrows[IllegalArgumentException](
      ds.interpolate(Seq("v"), strategy = "cubic").df.collect())
  }

  test("mergeSorted yields a globally sorted frame, left wins ties") {
    import spark.implicits._
    val a = GDataset(
      Seq((1L, 0.0, "a1"), (1L, 2.0, "a2"), (1L, 5.0, "a3")).toDF("k", "x", "tag"),
      "x", Seq("k"))
    val b = GDataset(
      Seq((1L, 1.0, "b1"), (1L, 2.0, "b2")).toDF("k", "x", "tag"),
      "x", Seq("k"))
    val got = a.mergeSorted(b, "x").df.collect().map(_.getString(2)).toSeq
    assert(got == Seq("a1", "b1", "a2", "b2", "a3"))
    // schema mismatch fails loudly instead of null-filling
    assertThrows[IllegalArgumentException](
      a.mergeSorted(GDataset(Seq((1L, 1.0)).toDF("k", "x"), "x", Seq("k")), "x"))
  }

  test("datafile csv round-trip") {
    val path = "/tmp/graft_test_csv"
    val f = Datafile(path, index = Some("ts"), idVars = Seq("user_id"))
    f.write(events.select(col("ts"), col("user_id"), col("value")).limit(100))
    val loaded = f.load(spark).get.toOption.get
    assert(loaded.index == "ts" && loaded.df.count() == 100)
  }

  test("datafile text format round-trips a raw line corpus") {
    import spark.implicits._
    // the line-per-row shape raw text dumps arrive in: one `value`
    // string column both ways (the generic format branch handles it)
    val f = Datafile("/tmp/graft_test_text", format = "text")
    val lines = Seq("first line", "second line", "third").toDF("value")
    f.write(lines)
    val loaded = f.load(spark).get.left.toOption.get
    assert(loaded.columns.toSeq == Seq("value"))
    assert(loaded.collect().map(_.getString(0)).toSet ==
      Set("first line", "second line", "third"))
  }

  test("datafile orc round-trip and partitioned parquet write prune on load") {
    val orc = Datafile("/tmp/graft_test_orc", index = Some("ts"), format = "orc")
    orc.write(events.select(col("ts"), col("user_id"), col("value")).limit(50))
    assert(orc.load(spark).get.toOption.get.df.count() == 50)

    val part = Datafile("/tmp/graft_test_part", index = Some("ts"),
      format = "parquet", partitionBy = Seq("event_type"))
    part.write(events.select(col("ts"), col("event_type"), col("value")))
    val loaded = part.load(spark).get.toOption.get.df
    // partition columns are recovered by discovery…
    assert(loaded.columns.contains("event_type"))
    assert(loaded.count() == events.count())
    // …and a filter on one reaches the scan as a partition filter
    // (directory pruning), not a pushed data filter
    val plan = loaded.filter(col("event_type") === "click")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.linesIterator.exists(l => l.contains("PartitionFilters") && l.contains("event_type")),
      s"partition filter did not reach the scan:\n$plan")
  }

  test("datafile missing path logs and returns None") {
    val f = Datafile("/tmp/graft_no_such_file_anywhere", index = Some("ts"))
    assert(f.load(spark).isEmpty)
  }

  test("pipe through a raw-DataFrame function re-wraps canonical columns") {
    val ds = GDataset(events.select(col("ts"), col("user_id"), col("value")),
      "ts", Seq("user_id"))
    val out = ds.pipeDf(d =>
      d.df.withColumn("extra", lit(1)).withColumn("value", col("value") * 2))
    assert(out.df.columns.toSeq == Seq("user_id", "ts", "value")) // extra dropped
    assert(out.index == "ts" && out.idVars == Seq("user_id"))
  }

  test("hconcat rejects colliding value-var names") {
    val a = GDataset(events.select(col("ts"), col("value")), "ts", Nil)
    assertThrows[IllegalArgumentException](a.hconcat(a))
  }

  test("unnest rejects struct fields shadowing existing columns") {
    val ds = GDataset(
      events.select(col("ts"), col("value"),
        struct(col("value"), col("user_id").as("uid")).as("s")),
      "ts", Nil)
    assertThrows[IllegalArgumentException](ds.unnest("s")) // field `value` collides
    assert(ds.drop("value").unnest("s").df.columns.contains("uid"))
  }

  test("reprHtml highlights index and id_vars cells and escapes content") {
    import spark.implicits._
    val ds = GDataset(
      Seq((1L, "a<b", 2.0)).toDF("ts", "who", "value"), "ts", Seq("who"))
    val html = ds.reprHtml()
    assert(html.contains("<th>ts</th><th>who</th><th>value</th>"))
    assert(html.contains("rgba(0,128,0,0.1)"), "index cell not green-tinted")
    assert(html.contains("rgba(0,128,255,0.1)"), "id_var cell not blue-tinted")
    assert(html.contains("a&lt;b"), "cell content must be HTML-escaped")
  }

  test("interpolate at a duplicated index value keeps the neighbor value") {
    import spark.implicits._
    // both bracketing observations sit at x=1: slope divide would be
    // null — the row must get the (consistent) neighbor value instead
    val df = Seq(
      (1L, 1.0, Option(10.0)), (1L, 1.0, Option.empty[Double]), (1L, 1.0, Option(10.0))
    ).toDF("k", "x", "v")
    val out = GDataset(df, "x", Seq("k")).interpolate(Seq("v"))
      .df.select("v").collect().map(r => r.isNullAt(0))
    assert(!out.exists(identity), "duplicate-index interpolation left a null")
  }

  test("regrid along an id_var axis swaps the index into the grouping keys") {
    import spark.implicits._
    // v is linear in x, so the natural cubic spline is exact on the grid
    val rows = for (k <- Seq(1L, 2L); t <- Seq(0.0, 1.0); x <- 0 to 3)
      yield (k, t, x.toDouble, 2.0 * x + k)
    val ds = GDataset(rows.toDF("k", "t", "x", "v"), "t", Seq("k", "x"))
    val out = ds.regrid(Array(0.5, 1.5), axis = "x")
    assert(out.index == "t" && out.idVars == Seq("k", "x"))
    val got = out.df.select("k", "t", "x", "v").orderBy("k", "t", "x").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == 2 * 2 * 2) // per (k, t) group: 2 grid points
    got.foreach { case (k, _, x, v) =>
      assert(math.abs(v - (2.0 * x + k)) < 1e-9, s"spline at ($k, $x) gave $v")
    }
  }
}
