import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
val spark = SparkSession.builder().master("local[8]").config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
spark.sparkContext.setLogLevel("WARN")
val dir = "/root/testdata/sf0.01"
val interesting = Seq("q1_agg", "q_filter_project", "q_join_agg", "q_semi_join", "q_topn", "q_select_data", "q_time_bucket")
val out = new java.io.PrintWriter("/tmp/explains.txt")
interesting.foreach { n =>
  out.println(s"===== $n =====")
  val plan = graft.SparkEntry.queries(n)(spark, dir).queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
  out.println(plan)
}
out.close()
println("WROTE /tmp/explains.txt")
