package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import java.nio.file.{Files, Paths}

/** Optimization-round evidence dump: writes each named query's
  * `.explain("formatted")` physical plan to <outDir>/<name>_<tag>.txt so
  * plan-shape claims in OPTIMIZATION_r*.md are checkable without running
  * Spark. Usage:
  *   runMain graft.PlanDump <outDir> <tag> [q_name ...]
  * With no names, dumps every declared query. Session configuration
  * matches Bench (same shuffle partitions, extensions, codegen cache)
  * so the dumped plan is the benched plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val only = args.drop(2).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    // SPARK_GRAFT_PLAN_EXECUTED=1 dumps the FINAL adaptive plan after
    // running the query to completion — AQE's runtime exchange reuse
    // (ReusedExchange) and join rewrites are invisible in the static
    // explain, so executed-work claims need this mode
    val executed = sys.env.get("SPARK_GRAFT_PLAN_EXECUTED").contains("1")
    names.foreach { n =>
      try {
        val qe = SparkEntry.queries(n)(spark, sfDir).queryExecution
        val plan = if (executed) {
          qe.executedPlan.execute().foreach(_ => ())
          qe.executedPlan.toString.split("== Initial Plan ==")(0)
        } else qe.explainString(FormattedMode)
        Files.writeString(Paths.get(outDir, s"${n}_$tag.txt"), plan)
        val ex = "Exchange".r.findAllIn(plan).size
        val reused = "ReusedExchange".r.findAllIn(plan).size
        val scans = plan.linesIterator.count(l =>
          l.contains("Scan parquet") || l.contains("FileScan"))
        println(s"[plandump] $n exchanges=$ex reused=$reused scans=$scans")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n failed: $e")
      }
    }
    spark.stop()
  }
}
