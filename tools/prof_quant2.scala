// :load — profile q_quantile phases at sf0.1
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
val spark = SparkSession.builder().master("local[32]").config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false").config("spark.sql.extensions", "graft.plans.GraftExtensions").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
val dir = "/root/testdata/sf0.1"
def timeIt[T](tag: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"[prof] $tag: ${(System.nanoTime()-t0)/1e9}%.3f s"); r }
def noop(df: org.apache.spark.sql.DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
val li = graft.Tables.t(spark, dir, "lineitem").select(col("l_returnflag"), col("l_extendedprice"))
noop(li); noop(li)
for (i <- 1 to 3) {
  timeIt(s"scan#$i") { noop(li) }
  timeIt(s"rangeShuffle#$i") { noop(li.filter(col("l_extendedprice").isNotNull).repartitionByRange(col("l_returnflag"), col("l_extendedprice")).sortWithinPartitions("l_returnflag", "l_extendedprice").withColumn("__mid", monotonically_increasing_id())) }
  timeIt(s"fullQuantile#$i") { noop(graft.operators.Quantiles.exactQuantiles(li, Seq("l_returnflag"), "l_extendedprice", Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75))) }
}
println("PROFQ_DONE")
