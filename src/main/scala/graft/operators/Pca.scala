package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA / whitening over an embedding column — the standard
  * post-processing between an embedding model and similarity search
  * (dimensionality cut for the ANN recall stage; whitening so cosine
  * isn't dominated by a few high-variance axes).
  *
  * 100 TB shape: the ONLY distributed work is one treeAggregate of
  * (n, Σx, Σxxᵀ) — a d-vector and a d×d upper triangle per partition
  * (d=64 → ~17 KB), combined tree-wise to the driver. The
  * eigendecomposition is O(d³) on a d×d matrix DRIVER-side (64³ ≈ 3e5
  * flops — independent of corpus size), and the projection is a
  * scan-local k·d fused HOF per row, no shuffle anywhere. This is the
  * textbook "small model, big data" split: nothing corpus-sized ever
  * leaves the executors.
  *
  * Determinism: the gram combine is floating-point and tree-shaped, so
  * last-ulp sums can vary with partitioning — eigenvectors are stable
  * to far more than that (spec pins axis recovery, orthogonality and
  * whitened variance, not raw bits). Component signs are normalized
  * (largest-|coordinate| positive) so reruns agree on direction.
  */
object Pca {

  /** mean, row-major components (k × d, orthonormal, variance-sorted
    * descending), and their eigenvalues (population covariance). */
  final case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double])

  /** Fit a k-component model. Null vectors are skipped; mismatched
    * dimensions fail loudly (a silent truncation would corrupt the
    * covariance). */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    val vecs = df.select(col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
    // (n, sum[d], upper-triangular gram[d(d+1)/2]); d fixed by first row
    type Acc = (Long, Array[Double], Array[Double])
    val zero: Acc = (0L, null, null)
    def seqOp(acc: Acc, row: org.apache.spark.sql.Row): Acc = {
      val x = row.getSeq[Double](0).toArray
      val (n, s, g) = acc
      val (s2, g2) =
        if (s == null) (new Array[Double](x.length), new Array[Double](x.length * (x.length + 1) / 2))
        else (s, g)
      require(s2.length == x.length,
        s"inconsistent embedding dims: ${s2.length} vs ${x.length}")
      var i = 0
      var t = 0
      while (i < x.length) {
        s2(i) += x(i)
        var j = i
        while (j < x.length) { g2(t) += x(i) * x(j); j += 1; t += 1 }
        i += 1
      }
      (n + 1, s2, g2)
    }
    def combOp(a: Acc, b: Acc): Acc =
      if (a._2 == null) b
      else if (b._2 == null) a
      else {
        require(a._2.length == b._2.length,
          s"inconsistent embedding dims: ${a._2.length} vs ${b._2.length}")
        var i = 0
        while (i < a._2.length) { a._2(i) += b._2(i); i += 1 }
        var t = 0
        while (t < a._3.length) { a._3(t) += b._3(t); t += 1 }
        (a._1 + b._1, a._2, a._3)
      }
    val (n, s, g) = vecs.rdd.treeAggregate(zero)(seqOp, combOp)
    require(n >= 2, s"need at least 2 vectors to fit PCA, got $n")
    val d = s.length
    require(k >= 1 && k <= d, s"k must be in [1, $d]")
    // population covariance C = G/n − μμᵀ (symmetric, PSD up to fp noise)
    val mean = s.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = g(t) / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    val order = values.indices.sortBy(idx => -values(idx)).take(k)
    val comps = order.map { idx =>
      val v = Array.tabulate(d)(r => vectors(r)(idx))
      // sign convention: largest-|coordinate| positive
      var am = 0
      var r = 1
      while (r < d) { if (math.abs(v(r)) > math.abs(v(am))) am = r; r += 1 }
      if (v(am) < 0) v.map(-_) else v
    }.toArray
    PcaModel(mean, comps, order.map(values).toArray)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector columns). O(d³) per sweep, converges
    * quadratically; plenty for the d ≤ a-few-hundred of embedding
    * models, and deterministic (fixed sweep order, no pivot search). */
  private[operators] def jacobiEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > 1e-22) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          off += a(p)(q) * a(p)(q)
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val sgn = if (theta >= 0) 1.0 else -1.0
            val tTan = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(tTan * tTan + 1.0)
            val sSin = tTan * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - sSin * arq
              a(r)(q) = sSin * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - sSin * aqr
              a(q)(r) = sSin * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - sSin * vrq
              v(r)(q) = sSin * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Project `vecCol` onto the model's components as `outCol`
    * (length-k array). `whiten = true` divides each coordinate by
    * √eigenvalue so every retained axis has unit variance (degenerate
    * axes floor at 1e-12 instead of dividing by ~0). Pure scan-local
    * fused HOFs — k·d multiply-adds per row, zero shuffle, codegen'd. */
  def transform(
      df: DataFrame,
      vecCol: String,
      model: PcaModel,
      outCol: String,
      whiten: Boolean = false): DataFrame = {
    val xd = col(vecCol).cast("array<double>")
    val centered = zip_with(xd, typedlit(model.mean.toSeq), (x, m) => x - m)
    val projections = model.components.indices.map { j =>
      val dot = aggregate(
        zip_with(centered, typedlit(model.components(j).toSeq), (x, w) => x * w),
        lit(0.0), (acc, e) => acc + e)
      if (whiten) dot / math.sqrt(math.max(model.eigenvalues(j), 1e-12)) else dot
    }
    df.withColumn(outCol, array(projections: _*))
  }

  /** The model as a tiny (kind, idx, vec) DataFrame for parquet
    * persistence — the IVF-centroid/PQ-codebook contract: fit ONCE on
    * a bounded pass, store the artifact, and project every future
    * ingest batch against the frozen model ([[modelFrom]] reads it
    * back bit-identically, so reloaded transforms are bit-equal). */
  def modelDf(spark: org.apache.spark.sql.SparkSession, model: PcaModel): DataFrame = {
    import spark.implicits._
    val rows =
      Seq(("mean", 0, model.mean.toSeq), ("eigenvalues", 0, model.eigenvalues.toSeq)) ++
        model.components.zipWithIndex.map { case (c, i) => ("component", i, c.toSeq) }
    rows.toDF("kind", "idx", "vec")
  }

  /** Read a persisted model back. Bounded by construction (k + 2
    * rows); malformed tables fail loudly. */
  def modelFrom(df: DataFrame, maxRows: Int = 4096): PcaModel = {
    val rows = df.select(col("kind"), col("idx"), col("vec"))
      .orderBy(col("kind"), col("idx"))
      .limit(maxRows + 1)
      .collect()
    require(rows.length <= maxRows,
      s"PCA model table exceeds maxRows=$maxRows — is this really a model?")
    def vecsOf(kind: String) = rows.filter(_.getString(0) == kind)
      .sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray)
    val mean = vecsOf("mean")
    val eig = vecsOf("eigenvalues")
    val comps = vecsOf("component")
    require(mean.length == 1 && eig.length == 1 && comps.nonEmpty,
      s"malformed PCA model table: ${mean.length} mean / ${eig.length} eigenvalue " +
        s"/ ${comps.length} component rows")
    require(eig.head.length == comps.length,
      s"eigenvalue count ${eig.head.length} != component count ${comps.length}")
    PcaModel(mean.head, comps, eig.head)
  }
}
