import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
val dir = "/root/testdata/sf0.1"
def exec(df: org.apache.spark.sql.DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
def time(name: String, n: Int = 3): Unit = {
  val df = graft.SparkEntry.queries(name)(spark, dir)
  exec(df) // warm
  val ts = (1 to n).map { _ =>
    val t0 = System.nanoTime(); exec(df); (System.nanoTime() - t0) / 1e9
  }
  println(s"$name -> ${ts.map(t => f"$t%.2f").mkString(", ")}s")
}
time("q_quantile")
time("q1_agg")
time("q_list_agg")
time("q_interpolate")
time("q_rank")
