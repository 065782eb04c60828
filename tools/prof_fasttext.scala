// :load from sbt console — profile q_quality_fasttext phases
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
val spark = SparkSession.builder().master("local[32]").config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false").config("spark.sql.extensions", "graft.plans.GraftExtensions").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import graft.functions.{TextFunctions => TF}
val dir = "/root/testdata/sf0.1"
def timeIt[T](tag: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"[prof] $tag: ${(System.nanoTime()-t0)/1e9}%.3f s"); r }
val docs = graft.Tables.t(spark, dir, "documents")
docs.write.mode("overwrite").format("noop").save()
def onePass(i: Int): Unit = {
  val labeled = docs.withColumn("label", (TF.filterReason(col("text")) === "ok").cast("int"))
  val w = timeIt(s"train#$i") { graft.operators.FastTextQuality.train(labeled, "label", "text", "doc_id", numBuckets = 1 << 14) }
  timeIt(s"score#$i") { docs.select(col("doc_id"), round(graft.operators.FastTextQuality.score(w, col("text")), 4).as("ft_quality")).write.mode("overwrite").format("noop").save() }
}
(1 to 3).foreach(onePass)
println("PROF_DONE2")
