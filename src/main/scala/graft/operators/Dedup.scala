package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.plans.TextHashColumns

/** Deduplication family for pretraining-scale corpora (SURVEY.md §2.3).
  * Every variant produces candidate pairs through a key-equality
  * shuffle join (hash key, band bucket, shingle, or LSH bucket) — never
  * an O(n²) cross join — so cost stays linear-ish in corpus size at
  * 100 TB. Mega-buckets (stop-shingles / degenerate bands) are capped.
  */
object Dedup {

  /** Exact dedup: content-hash groupBy, min-id winner per group.
    * The hash is the shuffle key — constant-width regardless of
    * document size. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Candidate near-dup pairs via MinHash + LSH banding: signature of
    * `numHashes` minhashes over `shingleN`-gram shingles, split into
    * `bands`; docs sharing any band bucket become candidates; estimated
    * Jaccard = matching signature positions / numHashes. */
  def minhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7,
      maxBucketSize: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands

    // native Catalyst expression — the HOF formulation in
    // TextFunctions.minhashSignature is ~50× slower (interpreted lambda
    // re-evaluating the shingle array per seed)
    val sigs = docs
      .select(col(idCol).as("id"),
        TextHashColumns.minhashSignature(col(textCol), shingleN, numHashes).as("sig"))

    val banded = sigs.select(
      col("id"), col("sig"),
      posexplode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws("_", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))), b)))
        .as(Seq("band", "bucket")))

    // cap degenerate buckets (e.g. empty-text docs all colliding)
    val capped = banded
      .withColumn("bsize", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bucket"))))
      .filter(col("bsize") <= maxBucketSize)

    val a = capped.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = capped.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), m => m))
          .cast("double") / numHashes).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: 64-bit fingerprint; candidates share at
    * least one of four 16-bit chunks (any pair within hamming distance
    * 3 must agree on ≥1 chunk — pigeonhole); verified by bit_count of
    * the xor. */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"), TextHashColumns.simhash(col(textCol)).as("sim"))
    val chunked = sigs.select(
      col("id"), col("sim"),
      posexplode(
        transform(
          sequence(lit(0), lit(3)),
          c => call_function("shiftright", col("sim"), c * 16).bitwiseAND(lit(0xffffL))))
        .as(Seq("chunk", "key")))
    val capped = chunked
      .withColumn("bsize", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("chunk"), col("key"))))
      .filter(col("bsize") <= maxBucketSize)
    val a = capped.select(col("chunk"), col("key"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = capped.select(col("chunk"), col("key"), col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard pairs: explode each doc's distinct shingles,
    * self-join on shingle (candidates = docs sharing ≥1 shingle),
    * count the intersection, Jaccard from |A|+|B|-|A∩B|. Stop-shingle
    * buckets are capped to keep the join linear at scale. */
  def jaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 5,
      threshold: Double = 0.5,
      maxShingleFreq: Int = 1000): DataFrame = {
    val sh = docs
      .select(col(idCol).as("id"),
        explode(array_distinct(TF.shingles(col(textCol), shingleN))).as("sh"))
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val filtered = sh
      .withColumn("freq", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("sh"))))
      .filter(col("freq") <= maxShingleFreq)
      .drop("freq")
    val inter = filtered.select(col("id").as("id_a"), col("sh"))
      .join(filtered.select(col("id").as("id_b"), col("sh")), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(col("i").cast("double") / (col("n_a") + col("n_b") - col("i")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding near-dup pairs above a cosine threshold. `bucketBy`
    * (e.g. a cluster/label/LSH column) bounds the pair space; null
    * means all-pairs (only sane for small corpora — at 100 TB callers
    * pass an LSH bucket from [[graft.functions.VectorFunctions]]). */
  def cosinePairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      bucketBy: Option[String] = None): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("v_a"),
      bucketBy.map(col).getOrElse(lit(0)).as("bk"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("v_b"),
      bucketBy.map(col).getOrElse(lit(0)).as("bk"))
    a.join(b, Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(graft.plans.VectorColumns.cosine(col("v_a"), col("v_b")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
