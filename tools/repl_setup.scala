import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
val spark = SparkSession.builder().master("local[32]").config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
spark.sparkContext.setLogLevel("WARN")
val dir = "/root/testdata/sf0.1"
def time(name: String): Unit = { val t0=System.nanoTime(); val n=graft.SparkEntry.queries(name)(spark, dir).count(); println(s"$name -> $n rows, ${(System.nanoTime()-t0)/1e9}s") }
