// :load — A/B old vs new hamming64Pairs shape in one JVM
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
val spark = SparkSession.builder().master("local[32]").config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false").config("spark.sql.extensions", "graft.plans.GraftExtensions").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
val dir = "/root/testdata/sf0.1"
def timeIt[T](tag: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"[prof] $tag: ${(System.nanoTime()-t0)/1e9}%.3f s"); r }
def noop(df: org.apache.spark.sql.DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
def sigs = graft.operators.Multimodal.dHashes(graft.operators.Multimodal.syntheticImages(graft.Tables.t(spark, dir, "documents"), "doc_id", bases = 40), "media_id", "payload")
println("PROFP_SETUP")
def oldPairs(sigsDf: org.apache.spark.sql.DataFrame, maxHamming: Int, maxBucketSize: Int) = {
  val numChunks = maxHamming + 1
  val width = (64 + numChunks - 1) / numChunks
  val mask = if (width >= 64) -1L else (1L << width) - 1L
  val chunked = sigsDf.select(col("id"), posexplode(transform(sequence(lit(0), lit(numChunks - 1)), c => call_function("shiftright", col("sig"), c * width).bitwiseAND(lit(mask)))).as(Seq("chunk", "key"))).select(col("id"), col("chunk"), col("key"))
  val capped = chunked.withColumn("__bsize", count(lit(1)).over(Window.partitionBy(col("chunk"), col("key")))).filter(col("__bsize") <= maxBucketSize).drop("__bsize")
  val pairs = capped.select(col("chunk"), col("key"), col("id").as("id_a")).join(capped.select(col("chunk"), col("key"), col("id").as("id_b")), Seq("chunk", "key")).filter(col("id_a") < col("id_b")).select(col("id_a"), col("id_b")).distinct()
  pairs.join(sigsDf.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a")).join(sigsDf.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b")).select(col("id_a"), col("id_b"), bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming")).filter(col("hamming") <= maxHamming)
}
noop(graft.Tables.t(spark, dir, "documents"))
for (i <- 1 to 3) {
  timeIt(s"phash-old#$i") { noop(oldPairs(sigs, 4, 1000)) }
  timeIt(s"phash-new#$i") { noop(graft.operators.Dedup.hamming64Pairs(sigs, 4, 1000)) }
}
println("PROFP_READY")
