import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}
val docs = graft.Tables.t(spark, dir, "documents")
def tt[A](label: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(s"$label: ${(System.nanoTime()-t0)/1e9}s"); r }
val sh0 = docs.select(col("doc_id").as("id"), explode(array_distinct(TF.shingles(col("text"), 5))).as("sh"))
tt("explode shingles count")(sh0.count())
val szs = sh0.groupBy(col("id")).agg(count(lit(1)).as("n"))
tt("sizes")(szs.count())
val filt = sh0.withColumn("freq", count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("sh")))).filter(col("freq") <= 1000).drop("freq")
tt("window freq")(filt.count())
val inter = filt.select(col("id").as("id_a"), col("sh")).join(filt.select(col("id").as("id_b"), col("sh")), Seq("sh")).filter(col("id_a") < col("id_b")).groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("i"))
tt("inter join")(inter.count())
