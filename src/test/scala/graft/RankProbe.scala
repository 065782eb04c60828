package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway measurement harness for the avgRank fixed-overhead hunt
  * (round-11 task). Not a spec — run with Test/runMain graft.RankProbe. */
object RankProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, String)]
    val starts = scala.collection.mutable.Map.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (j.time, Option(j.properties.getProperty("spark.job.description")).getOrElse("").take(60))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.get(j.jobId).foreach { case (t0, d) => jobs += ((j.jobId, j.time - t0, d)) }
    })
    val dir = "/root/testdata/sf0.1"
    def orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))

    def time(name: String)(f: => DataFrame): Unit = {
      // warm once
      f.write.mode("overwrite").format("noop").save()
      jobs.clear()
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"== $name%-28s ${ms}%8.1f ms  jobs=${jobs.size}")
      jobs.sortBy(_._1).foreach { case (id, d, desc) => println(f"   job $id%3d ${d}%6d ms  $desc") }
    }

    time("current avgRank") {
      graft.queries.Relational.avgRank(orders, "o_totalprice", "price_rank")
    }

    time("persist-counts (r9 shape)") {
      val c = col("o_totalprice")
      val nPart = 32
      val counts = orders.select(c).na.drop().groupBy(c).agg(count(lit(1)).as("__n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ranged = counts.repartitionByRange(nPart, c).withColumn("__pid", spark_partition_id())
      val wOff = Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)
      val offs = ranged.groupBy(col("__pid")).agg(sum(col("__n")).as("__t"))
        .select(col("__pid"), coalesce(sum(col("__t")).over(wOff), lit(0L)).as("__off"))
      val w = Window.partitionBy(col("__pid")).orderBy(c)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranks = ranged.join(broadcast(offs), Seq("__pid"))
        .select(c, (col("__off") + sum(col("__n")).over(w) - (col("__n") - 1) / lit(2.0)).as("price_rank"))
      val out = orders.join(ranks, Seq("o_totalprice"), "left")
      out
    }

    // AQE off: does adaptive re-planning add fixed latency here?
    time("current avgRank, AQE off") {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val r = graft.queries.Relational.avgRank(orders, "o_totalprice", "price_rank")
      r
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    time("rdd two-pass variant") {
      val cName = "o_totalprice"
      val c = col(cName)
      val nPart = 32
      val counts = orders.select(c).na.drop().groupBy(c).agg(count(lit(1)).as("__n"))
      val sorted = counts.repartitionByRange(nPart, c).sortWithinPartitions(c)
      val types = sorted.schema.fields.map(_.dataType)
      val rdd = sorted.queryExecution.toRdd
      val partSums = rdd.mapPartitionsWithIndex { (pid, it) =>
        Iterator.single((pid, it.foldLeft(0L)((a, r) => a + r.getLong(1))))
      }.collect().sortBy(_._1).map(_._2)
      val offsets = partSums.scanLeft(0L)(_ + _)
      val bOff = spark.sparkContext.broadcast(offsets)
      val ranksRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
        var run = bOff.value(pid)
        it.map { r =>
          val n = r.getLong(1)
          run += n
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](r.get(0, types(0)), run - (n - 1) / 2.0))
            : org.apache.spark.sql.catalyst.InternalRow
        }
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        sorted.schema.fields(0),
        org.apache.spark.sql.types.StructField("price_rank",
          org.apache.spark.sql.types.DoubleType, nullable = false)))
      val ranks = org.apache.spark.sql.GraftShim.internalCreateDataFrame(spark, ranksRdd, schema)
      orders.join(ranks, Seq(cName), "left")
    }

    // sanity: variant equals current on the full column
    {
      val cur = graft.queries.Relational.avgRank(orders, "o_totalprice", "r")
        .groupBy().agg(sum(col("r")), count(lit(1))).collect().head
      println(s"current  sum=${cur.get(0)} n=${cur.get(1)}")
    }

    spark.catalog.clearCache()
    spark.stop()
  }
}
