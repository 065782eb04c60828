// :load — per-query job/stage accounting for the slowest queries
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
val spark2 = SparkSession.builder().master("local[32]").config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false").config("spark.sql.extensions", "graft.plans.GraftExtensions").getOrCreate()
spark2.sparkContext.setLogLevel("ERROR")
val nJobs = new AtomicInteger(0); val nStages = new AtomicInteger(0); val jobMs = new AtomicLong(0L); val taskMs = new AtomicLong(0L)
val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
val listener = new SparkListener {
  override def onJobStart(j: SparkListenerJobStart): Unit = { nJobs.incrementAndGet(); jobStart.put(j.jobId, j.time) }
  override def onJobEnd(j: SparkListenerJobEnd): Unit = { val s = jobStart.remove(j.jobId); if (s != null) jobMs.addAndGet(j.time - s) }
  override def onStageCompleted(st: SparkListenerStageCompleted): Unit = { nStages.incrementAndGet() }
  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = { if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration) }
}
spark2.sparkContext.addSparkListener(listener)
val dir2 = "/root/testdata/sf0.1"
def runQ(name: String): Unit = {
  val df = graft.SparkEntry.queries(name)(spark2, dir2)
  df.write.mode("overwrite").format("noop").save()
}
def profQ(name: String): Unit = {
  runQ(name) // warm
  Thread.sleep(400)
  nJobs.set(0); nStages.set(0); jobMs.set(0); taskMs.set(0)
  val t0 = System.nanoTime()
  runQ(name)
  val wall = (System.nanoTime() - t0) / 1e9
  Thread.sleep(400)
  println(f"[jobs] $name%-28s wall=$wall%6.2f jobs=${nJobs.get}%3d stages=${nStages.get}%3d jobSum=${jobMs.get/1000.0}%6.2f taskSum=${taskMs.get/1000.0}%7.2f")
}
Seq("q_corr_matrix_spearman","q_dedup_substring_exact","q_dedup_keep_best","q_split_safe","q_corr_spearman","q_qcut","q_dedup_cluster_sizes","q_dedup_phash","q_quantile_nearest","q_dedup_cluster","q_winsorize","q_lm_trigram","q_dsir_sample_domain","q_rank_global","q_quality_model","q_fill_median","q_dsir_sample","q_quantile","q_join_agg","q_dsir_weights","q_budget_bpe","q_ann_ivf_pq","q_ccnet_buckets","q_rolling_corr","q_dsir_frozen_domain").foreach(profQ)
println("PROFJ_DONE")
