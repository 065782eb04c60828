// :load — q_quality_model phase breakdown
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
val spark = SparkSession.builder().master("local[32]").config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false").config("spark.sql.extensions", "graft.plans.GraftExtensions").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import graft.functions.{TextFunctions => TF}
val dir = "/root/testdata/sf0.1"
def timeIt[T](tag: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"[prof] $tag: ${(System.nanoTime()-t0)/1e9}%.3f s"); r }
def noop(df: org.apache.spark.sql.DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
val docs = graft.Tables.t(spark, dir, "documents")
noop(docs)
def one(i: Int): Unit = {
  val labeled = docs.withColumn("label", (TF.filterReason(col("text")) === "ok").cast("int"))
  val w = timeIt(s"qm-train#$i") { graft.operators.QualityModel.train(labeled, "label", "text", "doc_id") }
  timeIt(s"qm-score#$i") { noop(docs.select(col("doc_id"), round(graft.operators.QualityModel.score(w, col("text")), 4).as("model_quality"))) }
}
(1 to 3).foreach(one)
// feature kernels individually
timeIt("filterReason") { noop(docs.select(TF.filterReason(col("text")).as("r"))) }
timeIt("tokenCount") { noop(docs.select(TF.tokenCount(col("text")).as("r"))) }
timeIt("punctRatio") { noop(docs.select(TF.punctRatio(col("text")).as("r"))) }
timeIt("stopwordRatio") { noop(docs.select(TF.stopwordRatio(col("text")).as("r"))) }
timeIt("symbolRatio") { noop(docs.select(TF.symbolRatio(col("text")).as("r"))) }
timeIt("meanWordLen") { noop(docs.select(TF.meanWordLen(col("text")).as("r"))) }
timeIt("compressionRatio") { noop(docs.select(TF.compressionRatio(col("text")).as("r"))) }
println("PROFQM_DONE")
