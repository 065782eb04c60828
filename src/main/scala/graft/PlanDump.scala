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
    names.foreach { n =>
      try {
        val plan = SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.explainString(FormattedMode)
        Files.writeString(Paths.get(outDir, s"${n}_$tag.txt"), plan)
        val ex = "Exchange".r.findAllIn(plan).size
        println(s"[plandump] $n exchanges=$ex")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n failed: $e")
      }
    }
    spark.stop()
  }
}
