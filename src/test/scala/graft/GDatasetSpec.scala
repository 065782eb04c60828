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

  test("concat unions idVars and aligns missing columns") {
    val a = GDataset(events.select(col("ts"), col("value")), "ts", Nil)
    val b = GDataset(events.select(col("ts"), col("user_id"), col("value")), "ts", Seq("user_id"))
    val c = GDataset.concat(Seq(a, b))
    assert(c.idVars == Seq("user_id"))
    assert(c.df.count() == 2 * events.count())
  }

  test("coord returns ordered uniques; extrema returns min/max") {
    val ds = GDataset(events, "ts", Seq("user_id"))
    val ids = ds.coord("user_id").collect().map(_.getLong(0)).toSeq
    assert(ids == ids.sorted && ids.distinct == ids)
    val (mn, mx) = ds.extrema("value")
    assert(mn.asInstanceOf[Double] <= mx.asInstanceOf[Double])
  }

  test("dropNan drops rows with NaN in any double column (incl. structs)") {
    import spark.implicits._
    val df = Seq((1.0, 2.0), (Double.NaN, 3.0), (4.0, Double.NaN), (5.0, 6.0))
      .toDF("a", "b").withColumn("i", monotonically_increasing_id())
      .withColumn("s", struct(col("b").as("inner")))
    val ds = GDataset(df, "i", Nil).dropNan
    assert(ds.df.count() == 2)
  }

  test("datafile csv round-trip") {
    val path = "/tmp/graft_test_csv"
    val f = Datafile(path, index = Some("ts"), idVars = Seq("user_id"))
    f.write(events.select(col("ts"), col("user_id"), col("value")).limit(100))
    val loaded = f.load(spark).toOption.get
    assert(loaded.index == "ts" && loaded.df.count() == 100)
  }
}
