package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.{KMeans, VectorFunctions => VF}

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
      .select(col("qid"), col("cid"), (round(graft.plans.VectorColumns.cosine(col("qv"), col("cv")), 6) + lit(0.0)).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("sim"), col("rank"))
  }

  /** Hard-negative mining for contrastive / retrieval training: per
    * query, the top-`k` corpus vectors whose cosine falls in
    * [`lo`, `hi`) — similar enough to be informative negatives, below
    * the near-duplicate band where a "negative" is actually a positive
    * (the standard dense-retrieval recipe, cf. DPR/ANCE). Brute-force
    * base, same determinism contract as [[bruteForceTopK]] (6dp-rounded
    * sims, id tie-break); at scale feed the candidate set from
    * [[ivfTopK]] with a larger k and band-filter the result — the band
    * is a post-filter either way.
    *
    * 100 TB shape: queries broadcast, the corpus never shuffles for
    * scoring, and the band filter cuts before the per-query top-k
    * window — at a typical [0.35, 0.9) band that drops the ~zero-sim
    * bulk of the corpus ahead of the rank shuffle. */
  def hardNegatives(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      lo: Double,
      hi: Double): DataFrame = {
    require(lo < hi, s"band [$lo, $hi) is empty")
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val scored = c
      .join(broadcast(q), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (round(graft.plans.VectorColumns.cosine(col("qv"), col("cv")), 6)
          + lit(0.0)).as("sim"))
      .filter(col("sim") >= lo && col("sim") < hi)
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("sim"), col("rank"))
  }

  /** Exact top-k cosine neighbors over int8-QUANTIZED vectors
    * (VectorFunctions.int8Quantize): the memory-bound recall stage —
    * 4× less data per vector moves through the scan, at a small
    * similarity error the rank order mostly absorbs. All products and
    * sums are exact integer arithmetic (only the final norm/divide is
    * float), so the scores are bit-identical on any engine — unlike
    * float-accumulated cosine, this variant is exactly
    * oracle-checkable end to end. */
  def bruteForceTopKInt8(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    def qz(d: DataFrame, id: String, v: String) =
      d.select(col(idCol).as(id), VF.int8Quantize(col(vecCol)).as(v))
    val q = qz(queries, "qid", "qv")
    val c = qz(corpus, "cid", "cv")
    // native codegen'd long dot — the per-pair scoring kernel; the HOF
    // zip_with+aggregate form pays two interpreted lambdas per element
    def idot(a: Column, b: Column): Column =
      graft.plans.VectorColumns.dotLong(a, b)
    // an exactly-zero vector quantizes to all zeros → 0/0 = NaN, and
    // NaN sorts above every double under desc: guard the denominator so
    // a zero vector scores 0 (engine-independent) instead of winning
    val denom = sqrt(idot(col("qv"), col("qv")).cast("double")) *
      sqrt(idot(col("cv"), col("cv")).cast("double"))
    val sim = when(denom > 0,
      round(idot(col("qv"), col("cv")).cast("double") / denom, 6) + lit(0.0))
      .otherwise(0.0)
    val scored = c
      .join(broadcast(q), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), sim.as("sim"))
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
        (round(graft.plans.VectorColumns.cosine(col("qv"), col("cv")), 6) + lit(0.0)).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("sim"), col("rank"))
  }

  /** IVF (inverted-file) ANN: a coarse quantizer of `nLists` spherical
    * k-means centroids — trained on a bounded, hash-ordered sample
    * collected to the driver (TakeOrdered, no full sort) — partitions
    * the corpus into cells; each query probes its `nProbe` nearest
    * cells and scores only the vectors living there. The 100 TB shape:
    * centroids broadcast as a literal (a few KB), cell assignment is a
    * per-row column expression over the scan, candidates pair via a
    * key-equality join on the cell id, and recall/cost tunes with
    * nProbe/nLists (nLists ≈ √corpus at real scale bounds a cell scan
    * to ~√n rows). */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 6,
      trainSample: Int = 2048,
      iters: Int = 10): DataFrame = {
    val (assigned, cents) = ivfBuild(corpus, idCol, vecCol, nLists, trainSample, iters)
    ivfTopKIndexed(assigned, cents, queries, idCol, vecCol, k, nProbe)
  }

  /** Train the IVF index ONCE: spherical k-means centroids from a
    * deterministic corpus sample, plus every corpus vector assigned to
    * its argmax cell. Returns (assigned = (cid, cv, cell), centroids =
    * (cell, centroid)) — BOTH plain DataFrames, so the index persists
    * as two parquet tables and [[ivfTopKIndexed]] probes it without
    * ever re-training or re-scanning the corpus. At 100 TB: write
    * `assigned` partitioned (or bucketed) by `cell` so an nProbe query
    * reads nProbe/nLists of the files; append new batches with
    * [[ivfAssign]] against the SAME stored centroids — the index grows
    * incrementally like the dedup signature indexes, and re-training is
    * an explicit, rare rebuild decision. */
  def ivfBuild(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nLists: Int = 16,
      trainSample: Int = 2048,
      iters: Int = 10): (DataFrame, DataFrame) = {
    // deterministic pseudo-random sample: top-N by id hash is a
    // TakeOrderedAndProject (per-partition partial top-N + merge), not
    // a global sort of the corpus
    val sample = corpus
      .orderBy(xxhash64(col(idCol)))
      .limit(trainSample)
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    val centArr = KMeans.spherical(sample, nLists, iters)
    import corpus.sparkSession.implicits._
    val centDf = centArr.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
    (ivfAssign(corpus, idCol, vecCol, centArr), centDf)
  }

  /** Assign vectors to their argmax-cosine cell against FIXED centroids
    * — the append path of a persisted IVF index: new batches join the
    * stored `assigned` table without touching historical vectors. */
  def ivfAssign(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    // nested Lists, not the Array-backed Seq map() returns — Catalyst's
    // literal converter rejects Array[Seq[_]] backing stores
    val cents = typedlit(centroids.map(_.toList).toList)
    // argmax cell only — dots computed once per row in a projection,
    // the array never leaves the stage
    df.select(col(idCol).as("cid"), col(vecCol).as("cv"),
        transform(cents, c => graft.plans.VectorColumns.cosine(col(vecCol), c)).as("__ds"))
      .select(col("cid"), col("cv"),
        (array_position(col("__ds"), array_max(col("__ds"))) - 1).as("cell"))
  }

  /** Probe a persisted IVF index: nProbe best cells per query against
    * the stored centroids (tiny — collected to the driver and inlined),
    * then one broadcast join of the probes against the assigned table.
    * The corpus side only streams; with `assigned` partitioned by cell,
    * partition pruning drops (nLists − nProbe)/nLists of it unread. */
  def ivfTopKIndexed(
      assigned: DataFrame,
      centroids: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 6): DataFrame = {
    val centArr = centroids.orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toArray)
    val nCells = centArr.length // < nLists when the train sample is tiny
    require(nProbe >= 1, "nProbe must be positive")
    val cents = typedlit(centArr.map(_.toList).toList)

    // queries: nProbe best cells via posexplode + row_number — the
    // query side is small by caller contract, so the window is free
    val wp = Window.partitionBy(col("qid")).orderBy(col("d").desc, col("cell"))
    val probes = queries
      .select(col(idCol).as("qid"), col(vecCol).as("qv"),
        posexplode(transform(cents, c => graft.plans.VectorColumns.cosine(col(vecCol), c)))
          .as(Seq("cell", "d")))
      .withColumn("pr", row_number().over(wp))
      .filter(col("pr") <= math.min(nProbe, nCells))
      .select(col("qid"), col("qv"), col("cell").cast("long").as("cell"))

    // query side is small by caller contract (same as bruteForceTopK);
    // the corpus side streams through a broadcast hash join on the cell
    val scored = assigned
      .join(broadcast(probes), Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (round(graft.plans.VectorColumns.cosine(col("qv"), col("cv")), 6) + lit(0.0)).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("sim"), col("rank"))
  }

  /** Embedding-space drift between two corpus slices — the
    * vector-side twin of [[Vocab.driftSummary]]: per-dimension
    * centroids of each slice, then the cosine between the two
    * centroids, the L2 centroid shift, and the mean absolute per-dim
    * shift, one summary row. A retrain/recrawl gate reads this before
    * trusting that a new embedding batch is distributionally
    * compatible with the index it is about to join.
    *
    * 100 TB shape: each slice pays ONE posexplode + dim-keyed
    * aggregation — map-side partial sums, so the shuffle carries
    * dim-sized rows per mapper (a few thousand), never the vectors;
    * the dim-keyed join and final fold are dim-sized. Nothing is
    * collected, nothing broadcast but the plan itself. */
  def embeddingDrift(old: DataFrame, cur: DataFrame, vecCol: String): DataFrame = {
    def centroid(df: DataFrame, tag: String) = df
      .select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col("dim")).agg(avg(col("x")).as(tag))
    centroid(old, "a").join(centroid(cur, "b"), Seq("dim"))
      .agg(
        count(lit(1)).as("n_dims"),
        sum(col("a") * col("b")).as("__dot"),
        sum(col("a") * col("a")).as("__na"),
        sum(col("b") * col("b")).as("__nb"),
        sum((col("a") - col("b")) * (col("a") - col("b"))).as("__ss"),
        sum(abs(col("a") - col("b"))).as("__sa"))
      .select(col("n_dims"),
        (round(col("__dot") / (sqrt(col("__na")) * sqrt(col("__nb"))), 4)
          + lit(0.0)).as("cos_centroids"),
        round(sqrt(col("__ss")), 4).as("l2_shift"),
        round(col("__sa") / col("n_dims"), 4).as("mean_abs_shift"))
  }
}
