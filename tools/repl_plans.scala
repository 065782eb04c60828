import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode
spark.sparkContext.setLogLevel("ERROR")
val dir = "/root/testdata/sf0.001"
def audit(name: String): Unit = {
  val p = graft.SparkEntry.queries(name)(spark, dir).queryExecution.explainString(FormattedMode)
  val exchanges = "Exchange".r.findAllIn(p).size
  val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin", "ExistingRDD").filter(p.contains)
  val wsc = "WholeStageCodegen".r.findAllIn(p).size
  println(s"== $name: exchanges=$exchanges wholestage=$wsc bad=${bad.mkString(",")}")
  println(p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Scan parquet") || l.contains("Join") || l.contains("Window") || l.contains("Sort")).take(20).mkString("\n"))
  println()
}
Seq("q_qcut", "q_range_join", "q_quantile", "q_ewm", "q_rolling_median", "q_ann_ivf", "q_mode", "q_is_duplicated").foreach(audit)
println("AUDIT_DONE")
