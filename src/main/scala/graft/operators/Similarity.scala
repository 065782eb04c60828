package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.{VectorFunctions => VF}

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2.3).
  *
  * Brute force broadcasts the (small) query set and scans the corpus
  * once — O(|corpus| · |queries| · dim), embarrassingly parallel, no
  * corpus shuffle: the 100 TB-sane baseline when |queries| is small.
  *
  * The LSH variant buckets corpus and queries by random-hyperplane
  * signature bands and only scores within shared buckets — sublinear
  * candidate sets at the cost of recall; recall is spec-tested against
  * brute force.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector. Ranking uses
    * the 6dp-rounded similarity with id tie-break, so results are
    * deterministic across partitionings. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val scored = c
      .join(broadcast(q), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), round(graft.plans.VectorColumns.cosine(col("qv"), col("cv")), 6).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("sim"), col("rank"))
  }

  /** LSH-bucketed ANN: `numPlanes` hyperplane bits split into `bands`
    * bucket keys; a corpus vector is a candidate for a query iff they
    * share at least one band bucket. */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      numPlanes: Int = 24,
      bands: Int = 8,
      seed: Long = 42L): DataFrame = {
    require(numPlanes % bands == 0)
    val bitsPerBand = numPlanes / bands
    val planes = VF.makePlanes(numPlanes, dim, seed)

    // bucket keys only — vectors stay out of the bucket shuffle; a
    // (qid, cid) pair colliding in several bands is scored once.
    def withBuckets(df: DataFrame, id: String): DataFrame =
      df.select(col(idCol).as(id),
          VF.hyperplaneBits(col(vecCol), planes).as("bits"))
        .select(col(id),
          posexplode(
            transform(
              sequence(lit(0), lit(bands - 1)),
              b => concat_ws("", slice(col("bits"), b * bitsPerBand + 1, lit(bitsPerBand)))))
            .as(Seq("band", "bucket")))
        .select(col(id), col("band"), col("bucket"))

    val candidates = withBuckets(corpus, "cid")
      .join(withBuckets(queries, "qid"), Seq("band", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"))
      .distinct()

    // Candidates attach to corpus vectors via a plain equi-join on the
    // id: the candidate set scales with |queries| × collision rate, so
    // it must not be force-broadcast (AQE still broadcasts it at
    // runtime when it is genuinely small). Only the query side — small
    // by caller contract — carries a broadcast hint.
    val scored = candidates
      .join(corpus.select(col(idCol).as("cid"), col(vecCol).as("cv")), Seq("cid"))
      .join(broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))), Seq("qid"))
      .select(col("qid"), col("cid"),
        round(graft.plans.VectorColumns.cosine(col("qv"), col("cv")), 6).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("sim"), col("rank"))
  }
}
