// pipe into `sbt console` — r15 task 6: re-challenge the exact-quantile
// family's range-shuffle design against a counts-table hybrid at the
// 10x stress scale. The hybrid aggregates (group, value) -> c first
// (map-side partial), reconstructs ranks from a c-weighted cumsum over
// the counts table, and evaluates the SAME floor/ceil interpolation
// arithmetic — bit-identical outputs where the counts table is small.
// CAVEAT for continuous columns: the key-offset stress replica
// duplicates every VALUE 10x (only keys shift), so counts-compression
// on l_extendedprice is 10x better here than real continuous data
// would allow — quantity (1..50 by TPC-H construction) is the honest
// discrete case, price results must be read with the replica caveat.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
val spark2 = SparkSession.builder().master("local[32]").config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false").config("spark.sql.extensions", "graft.plans.GraftExtensions").getOrCreate()
spark2.sparkContext.setLogLevel("ERROR")
val dir = sys.env.getOrElse("AB_DIR", "/tmp/sfstress")
def noop(df: org.apache.spark.sql.DataFrame): Unit =
  df.write.mode("overwrite").format("noop").save()
def timeIt(tag: String)(f: => Unit): Unit = {
  val t0 = System.nanoTime(); f
  println(f"[ab] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
}

def countsQuantiles(df: org.apache.spark.sql.DataFrame, g: String, v: String,
    ps: Seq[(String, Double)]): org.apache.spark.sql.DataFrame = {
  val counts = df.select(col(g), col(v)).filter(col(v).isNotNull)
    .groupBy(col(g), col(v)).agg(count(lit(1)).as("__c"))
  val w = Window.partitionBy(col(g)).orderBy(col(v))
  val cum = counts
    .withColumn("__hi", sum(col("__c")).over(w) - 1)
    .withColumn("__lo", col("__hi") - col("__c") + 1)
    .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col(g))))
  def q(p: Double) = {
    val idx = (col("__n") - 1).cast("double") * p
    val vd = col(v)
    sum(when(floor(idx) >= col("__lo") && floor(idx) <= col("__hi"),
      vd * (lit(1.0) - (idx - floor(idx)))).otherwise(lit(0.0))) +
      sum(when(ceil(idx) > col("__hi") || ceil(idx) < col("__lo"), lit(0.0))
        .otherwise(when(ceil(idx) =!= floor(idx), vd * (idx - floor(idx)))
          .otherwise(lit(0.0))))
  }
  cum.groupBy(col(g)).agg(
    ps.head match { case (n, p) => q(p).as(n) },
    ps.tail.map { case (n, p) => q(p).as(n) }: _*)
}

val li = graft.Tables.t(spark2, dir, "lineitem")
val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75)
for (c <- Seq("l_quantity", "l_extendedprice")) {
  val nd = li.select(col(c)).distinct.count()
  val nr = li.count()
  println(s"[ab] $c: $nd distinct in $nr rows")
  // warm both
  noop(graft.operators.Quantiles.exactQuantiles(
    li.select(col("l_returnflag"), col(c)), Seq("l_returnflag"), c, ps))
  noop(countsQuantiles(li, "l_returnflag", c, ps))
  for (i <- 1 to 3) {
    timeIt(s"$c range#$i") {
      noop(graft.operators.Quantiles.exactQuantiles(
        li.select(col("l_returnflag"), col(c)), Seq("l_returnflag"), c, ps))
    }
    timeIt(s"$c counts#$i") { noop(countsQuantiles(li, "l_returnflag", c, ps)) }
  }
  // value agreement (bit-level via collected doubles)
  val a = graft.operators.Quantiles.exactQuantiles(
    li.select(col("l_returnflag"), col(c)), Seq("l_returnflag"), c, ps)
    .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
  val b = countsQuantiles(li, "l_returnflag", c, ps)
    .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
  println(s"[ab] $c values equal: ${a == b}  a=$a b=$b")
}
println("AB_DONE")
