import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
val spark = SparkSession.builder().master("local[8]").config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
val emb = graft.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
val queries = emb.filter(col("vec_id") < 20)
println("--- default ivf ---")
try {
  val n = graft.operators.Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5).count()
  println(s"default ok: $n rows")
} catch { case e: Throwable => println("default FAILED: " + e.getMessage.take(300)) }
println("--- full probe ivf ---")
try {
  val n = graft.operators.Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5, nLists = 8, nProbe = 8).count()
  println(s"full ok: $n rows")
} catch { case e: Throwable => println("full FAILED: " + e.getMessage.take(300)) }
