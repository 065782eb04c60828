package graft

import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.t(spark, Sf, "embeddings")

  test("native CosineSim matches the HOF formulation bitwise") {
    val pairs = emb.limit(40).select(col("vec_id").as("ida"), col("embedding").as("va"))
      .crossJoin(emb.limit(40).select(col("vec_id").as("idb"), col("embedding").as("vb")))
    val bad = pairs.select(
      graft.plans.VectorColumns.cosine(col("va"), col("vb")).as("native"),
      VF.cosine(col("va"), col("vb")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(bad == 0)
  }

  test("cosine of a vector with itself is 1") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "v")
    val c = df.select(VF.cosine(col("v"), col("v"))).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("brute force top-k: k rows per query, descending sims, self excluded") {
    val queries = emb.filter(col("vec_id") < 5)
    val out = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 3).collect()
    assert(out.length == 5 * 3)
    out.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val sims = rows.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(sims == sims.sorted.reverse)
      assert(!rows.exists(_.getLong(1) == qid))
    }
  }

  test("lsh recall vs brute force is substantial") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", k = 5, dim = 64)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall > 0.2, s"recall $recall")
  }
}
