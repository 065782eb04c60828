package graft
import org.apache.spark.sql.SparkSession

/** Per-query wall-time benchmark over SPARK_GRAFT_SF_DIR (driver
  * contract: one JSON line on stdout). Queries run in sorted-name order
  * after a warmup pass at the smallest scale factor — the warmup
  * compiles every codegen path and JITs the hash kernels so measured
  * times reflect steady-state throughput, not first-query JVM startup.
  *
  * Noise defenses, in order: (1) three INTERLEAVED round-robin passes
  * with per-query minima — same-query repeats land minutes apart, so a
  * transient (GC pause, noisy neighbor) cannot inflate all samples of
  * one query into a phantom regression; (2) a 10k-entry codegen class
  * cache so interleaving measures execution, not recompilation;
  * (3) an outlier re-run pass against the previous committed record —
  * a query still >1.5x its committed time after the passes gets one
  * later isolated sample, so only regressions that REPRODUCE survive
  * into the record.
  *
  * Failures are loud: a query that throws is reported per-run on
  * stderr, lands in the JSON's `errors` field, and makes the process
  * exit nonzero — a bench-only regression (e.g. an OOM at a scale the
  * correctness gate doesn't reach) must never bench as ~0s and pass.
  * The full result line is also written to BENCH_local.json so the
  * complete per-query record survives any log truncation.
  */
object Bench {
  /** Run a query to completion through the noop sink: every row is
    * produced and every column materialized, unlike `count()`, under
    * which Catalyst prunes projection-only work down to a row count. */
  private def exec(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // static conf, must be set before the session exists: the default
      // 100-entry codegen class cache holds ~30 queries' generated
      // stages, so ROUND-ROBIN passes (see below) would recompile every
      // stage every pass and bench compile time, not execution time
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      names.foreach { n =>
        try exec(SparkEntry.queries(n)(spark, warmDir))
        catch { case _: Throwable => () } // warmup errors re-surface in the timed runs
      }
    }
    // best of three timed runs, INTERLEAVED round-robin: the whole query
    // list runs three times (pass 1 of all queries, then pass 2, then
    // pass 3) and each query keeps its per-pass minimum. Consecutive
    // same-query repeats share any transient box load across all three
    // samples, so a GC pause or noisy neighbor inflates every sample of
    // that one query and survives into the committed record as a phantom
    // regression; spreading the repeats ~minutes apart makes the min a
    // trustworthy steady-state number.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val samples = scala.collection.mutable.LinkedHashMap.empty[String, List[Double]]
    for (pass <- 1 to 3; name <- names) {
      val t0 = System.nanoTime()
      try {
        exec(SparkEntry.queries(name)(spark, sfDir))
        samples(name) = ((System.nanoTime() - t0) / 1e9) :: samples.getOrElse(name, Nil)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name pass $pass failed: $e")
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
      }
    }
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      new java.io.File(sys.props("user.dir"), "BENCH_local.json").getPath)
    // outlier re-run pass: any query whose interleaved min still sits
    // >1.5x above the PREVIOUS committed record (read before this run
    // overwrites it) gets one more isolated sample, minutes after the
    // passes — a machine transient that inflated all three interleaved
    // samples has passed by now, so a real regression survives this
    // and a phantom one does not
    val prior: Map[String, Double] = try {
      val txt = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out)))
      """"(q[a-z0-9_]*)":([0-9.Ee+-]+)""".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case _: Throwable => Map.empty }
    for (name <- names; p <- prior.get(name); t <- samples.get(name).flatMap(_.minOption)
         if t > 1.5 * p && t > 0.1) {
      val t0 = System.nanoTime()
      try {
        exec(SparkEntry.queries(name)(spark, sfDir))
        samples(name) = ((System.nanoTime() - t0) / 1e9) :: samples(name)
      } catch { case _: Throwable => () } // already recorded in the passes
    }
    val results = names.flatMap(n => samples.get(n).flatMap(_.minOption).map(n -> _))
    def jq(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = results.map { case (k, v) => jq(k) + ":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jq(k) + ":" + jq(v.take(300)) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    println(line)
    // durable copy: the driver's artifact keeps only a stdout tail, so
    // the committed file is the complete per-query record of the round
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write $out: $e") }
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"[bench] ${errors.size} queries failed: ${errors.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}
