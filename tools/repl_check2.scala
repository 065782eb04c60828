import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
val spark = SparkSession.builder().master("local[32]").config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
spark.sparkContext.setLogLevel("WARN")
def time(name: String, dir: String): Unit = { val t0=System.nanoTime(); val n=graft.SparkEntry.queries(name)(spark, dir).count(); println(s"$name@$dir -> $n rows, ${(System.nanoTime()-t0)/1e9}s") }
time("q_dedup_cosine", "/root/testdata/sf0.01")
time("q_ann_lsh", "/root/testdata/sf0.01")
time("q_dedup_cosine", "/root/testdata/sf0.1")
time("q_ann_lsh", "/root/testdata/sf0.1")
time("q_dedup_cosine", "/root/testdata/sf0.1")
time("q_ann_lsh", "/root/testdata/sf0.1")
