import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
val df = graft.SparkEntry.queries("q_quantile")(spark, "/root/testdata/sf0.001")
df.collect()
val p = df.queryExecution.executedPlan.toString
println("REUSED_EXCHANGE=" + "ReusedExchange".r.findAllIn(p).size)
println("SCANS=" + "Scan parquet".r.findAllIn(p).size)
println("REUSE_CHECK_DONE")
