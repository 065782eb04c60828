package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}
import graft.operators.{Curate, Pack, Snapshot}

/** Snapshot diffing, URL canonicalization / blocklisting, and
  * length-bucket padding stats — hand-computed expectations. */
class CurationSpec extends SparkSpec {

  test("snapshot diff classifies added / removed / changed and drops unchanged") {
    import spark.implicits._
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val cur = Seq((2L, "b"), (3L, "cX"), (4L, "d")).toDF("doc_id", "text")
    val got = Snapshot.diff(old, cur, "doc_id", "text")
      .select("id", "status").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("snapshot diff carries the old hash for removed rows, the new hash otherwise") {
    import spark.implicits._
    val old = Seq((1L, "gone")).toDF("doc_id", "text")
    val cur = Seq((2L, "here")).toDF("doc_id", "text")
    val hashes = Snapshot.diff(old, cur, "doc_id", "text")
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    val md5 = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(hashes == Map("removed" -> md5("gone"), "added" -> md5("here")))
  }

  test("diffAgainstIndex equals diff, with the index frozen through parquet") {
    import spark.implicits._
    val docs = Tables.t(spark, Sf, "documents")
    val old = docs.filter(col("doc_id") % 3 =!= 0)
    val cur = docs.filter(col("doc_id") % 5 =!= 0)
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" v2"))).otherwise(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("snapidx").toString
    Snapshot.hashIndex(old, "doc_id", "text").write.mode("overwrite").parquet(dir)
    val viaIndex = Snapshot.diffAgainstIndex(spark.read.parquet(dir), cur, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val direct = Snapshot.diff(old, cur, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(viaIndex == direct && direct.nonEmpty)
  }

  test("churnStats: counts plus the unchanged carry-over fraction of the NEW snapshot") {
    import spark.implicits._
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val cur = Seq((2L, "b"), (3L, "cX"), (4L, "d")).toDF("doc_id", "text")
    val r = Snapshot.churnStats(old, cur, "doc_id", "text").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 1L, 1L)))
    assert(r.getDouble(3) == 0.3333) // 1 of 3 new rows carried over
  }

  test("churnStats of identical snapshots: zero churn, full carry-over") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    val r = Snapshot.churnStats(a, a, "doc_id", "text").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) == ((0L, 0L, 0L, 1.0)))
  }

  private def canon(url: String): String = {
    import spark.implicits._
    Seq(url).toDF("u").select(TF.canonicalUrl(col("u"))).collect().head.getString(0)
  }

  test("canonicalUrl: case, default port, fragment, tracking params, param order, trailing slash") {
    assert(canon("HTTPS://Ex.COM:443/A/b/?utm_source=1&b=2&a=1&fbclid=x#f")
      == "https://ex.com/A/b?a=1&b=2")
    assert(canon("http://ex.com:80/") == "http://ex.com/")
    assert(canon("https://ex.com") == "https://ex.com/")
    assert(canon("http://ex.com:8080/p/?") == "http://ex.com:8080/p")
    // the point of the exercise: same page, different crawl artifacts
    assert(canon("https://ex.com/a?b=2&a=1") == canon("HTTPS://EX.com:443/a/?a=1&b=2#x"))
    // non-default port and path/query case survive
    assert(canon("https://ex.com:8443/Q?X=1") == "https://ex.com:8443/Q?X=1")
  }

  test("canonicalUrl is null-safe and host helpers strip ports") {
    import spark.implicits._
    val r = Seq(Option.empty[String]).toDF("u")
      .select(TF.canonicalUrl(col("u"))).collect().head
    assert(r.isNullAt(0))
    val h = Seq("https://A.B.Ex.COM:8443/p").toDF("u")
      .select(TF.urlHost(col("u")), TF.registeredDomain(col("u"))).collect().head
    assert(h.getString(0) == "a.b.ex.com" && h.getString(1) == "ex.com")
  }

  test("blocklistFilter: domain entries block every subdomain, host entries block exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://a.bad.com/x"),    // blocked: registered domain bad.com
      (2L, "https://bad.com/x"),      // blocked: registered domain bad.com
      (3L, "https://ads.ok.com/x"),   // blocked: exact host entry
      (4L, "https://www.ok.com/x"),   // kept: ok.com not listed, host not listed
      (5L, "https://fine.org/x")      // kept
    ).toDF("doc_id", "url")
    val bl = Seq("bad.com", "ads.ok.com").toDF("domain")
    val kept = Curate.blocklistFilter(docs, "url", bl)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(4L, 5L))
  }

  test("paddingStats: per-bucket capacity and padding fraction, overflow isolated") {
    import spark.implicits._
    val docs = Seq((1L, 5L), (2L, 20L), (3L, 40L), (4L, 100L)).toDF("id", "n_tok")
    val got = Pack.paddingStats(docs, "n_tok", Seq(16, 32, 64))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(16L) == ((1L, 5L, 16L, 0.6875)))
    assert(got(32L) == ((1L, 20L, 32L, 0.375)))
    assert(got(64L) == ((1L, 40L, 64L, 0.375)))
    assert(got(-1L) == ((1L, 100L, 100L, 0.0))) // overflow: needs chunking, zero padding
  }

  test("tokenDrift: hand-computed Laplace-smoothed KL terms") {
    import spark.implicits._
    import graft.operators.Vocab
    val old = Seq((1L, "a a b")).toDF("doc_id", "text")
    val cur = Seq((1L, "a b b")).toDF("doc_id", "text")
    val got = Vocab.tokenDrift(old, cur, "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // V=2, N_old=N_new=3: p(a): old 3/5, new 2/5; p(b): old 2/5, new 3/5
    def t8(pn: Double, po: Double) =
      BigDecimal(pn * math.log(pn / po)).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("a") == ((2L, 1L, t8(0.4, 0.6))))
    assert(got("b") == ((1L, 2L, t8(0.6, 0.4))))
  }

  test("driftSummary: zero on identical corpora, symmetric JSD on the hand case") {
    import spark.implicits._
    import graft.operators.Vocab
    val a = Seq((1L, "x y z x")).toDF("doc_id", "text")
    val same = Vocab.driftSummary(a, a, "text").collect().head
    assert((same.getDouble(0), same.getDouble(1), same.getDouble(2)) == ((0.0, 0.0, 0.0)))

    val old = Seq((1L, "a a b")).toDF("doc_id", "text")
    val cur = Seq((1L, "a b b")).toDF("doc_id", "text")
    val r = Vocab.driftSummary(old, cur, "text").collect().head
    def term(pn: Double, po: Double) = pn * math.log(pn / po)
    val kl = term(0.4, 0.6) + term(0.6, 0.4)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(0) == r6(kl))
    assert(r.getDouble(1) == r6(kl)) // the mirrored distributions make KL symmetric here
    val jsd = (term(0.4, 0.5) / 2 + term(0.6, 0.5) / 2) * 2
    assert(r.getDouble(2) == r6(jsd))
    assert(r.getDouble(2) < r.getDouble(0)) // JSD is the bounded one
  }

  test("vectorQaReason: first-fail order over null / dim / NaN / Inf / zero / ok") {
    import spark.implicits._
    import graft.functions.{VectorFunctions => VF}
    val rows = Seq(
      (1L, null.asInstanceOf[Array[Float]]),       // null_vec
      (2L, Array(1.0f, 2.0f)),                     // wrong_dim (expected 3)
      (3L, Array(1.0f, Float.NaN, 2.0f)),          // non_finite
      (4L, Array(1.0f, Float.PositiveInfinity, 0f)), // non_finite
      (5L, Array(0.0f, 0.0f, 0.0f)),               // zero
      (6L, Array(0.0f, 0.5f, -0.5f))               // ok
    ).toDF("id", "v")
    val got = rows.select(col("id"), VF.vectorQaReason(col("v"), 3).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "null_vec", 2L -> "wrong_dim", 3L -> "non_finite",
      4L -> "non_finite", 5L -> "zero", 6L -> "ok"))
    // priority: a wrong-dim vector full of NaN reports wrong_dim
    val pri = Seq((1L, Array(Float.NaN))).toDF("id", "v")
      .select(VF.vectorQaReason(col("v"), 3)).collect().head.getString(0)
    assert(pri == "wrong_dim")
  }

  test("piiCounts agrees with redactPii span for span") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a.b@c.org and x@y.io from 10.0.0.1 call 555-123-4567"),
      (2L, "clean prose with numbers 123 and dots..."),
      (3L, "ips 1.2.3.4 5.6.7.8 and phone 555-000-1111")
    ).toDF("id", "text")
    val c = TF.piiCounts(col("text"))
    val got = docs.select(col("id"),
        c.getField("n_emails"), c.getField("n_ips"), c.getField("n_phones"),
        // masks the redaction chain actually wrote
        (size(split(TF.redactPii(col("text")), "<EMAIL>|<IP>|<PHONE>")) - 1).as("masked"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(got(1L) == ((2, 1, 1, 4)))
    assert(got(2L) == ((0, 0, 0, 0)))
    assert(got(3L) == ((0, 2, 1, 3)))
    // the counts are defined as "what redactPii masks" — assert the sum
    got.values.foreach { case (e, i, p, masked) => assert(e + i + p == masked) }
  }

  test("search_sorted sides: left inserts before ties, right after") {
    import spark.implicits._
    import graft.operators.SearchSorted
    val df = Seq(1.0, 2.0, 2.0, 2.0, 3.0).toDF("v")
    def run(side: String) = SearchSorted.insertionIndexes(df, "v", Seq(2.0), side)
      .collect().head.getLong(1)
    assert(run("left") == 1L)   // before the tie run of 2.0s
    assert(run("right") == 4L)  // after it
    intercept[IllegalArgumentException](
      SearchSorted.insertionIndexes(df, "v", Seq(2.0), "middle"))
  }

  test("driftByStratum isolates the drifted stratum") {
    import spark.implicits._
    import graft.operators.Vocab
    val old = Seq(("de", "ein zwei drei"), ("en", "one two three")).toDF("lang", "text")
    val cur = Seq(("de", "ein zwei drei neu wort"), ("en", "one two three")).toDF("lang", "text")
    val got = Vocab.driftByStratum(old, cur, "lang", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got("de") > got("en"), s"planted de drift must dominate: $got")
    assert(got("en") == 0.0, "identical en snapshots must show zero JSD")
  }

  test("paddingStats rejects unsorted or empty boundary lists") {
    import spark.implicits._
    val docs = Seq((1L, 5L)).toDF("id", "n_tok")
    intercept[IllegalArgumentException](Pack.paddingStats(docs, "n_tok", Seq(32, 16)))
    intercept[IllegalArgumentException](Pack.paddingStats(docs, "n_tok", Seq.empty))
  }

  test("boilerplate index freeze: per-batch strip against the frozen index == one-shot") {
    import spark.implicits._
    import graft.operators.Curate
    val banner = "THE COMMON BANNER SENTENCE"
    val docs = Seq(
      (1L, "s1", s"$banner. unique one"),
      (2L, "s1", s"$banner. unique two"),
      (3L, "s1", s"$banner. unique three"),
      (4L, "s2", s"$banner. other source")).toDF("doc_id", "source", "text")
    def toMap(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[Long]("n_boiler"))).toMap
    val oneShot = toMap(Curate.boilerplateStrip(docs, "doc_id", "text",
      Seq("source"), sep = ". ", minDocs = 3, minUnitChars = 15))
    val index = Curate.boilerplateIndex(docs, "doc_id", "text",
      Seq("source"), sep = ". ", minDocs = 3, minUnitChars = 15).localCheckpoint()
    def strip(batch: org.apache.spark.sql.DataFrame) =
      toMap(Curate.boilerplateStripAgainstIndex(batch, index, "doc_id", "text",
        Seq("source"), sep = ". ", minUnitChars = 15))
    val streamed = strip(docs.filter(col("doc_id") <= 2)) ++
      strip(docs.filter(col("doc_id") > 2))
    assert(streamed == oneShot,
      "micro-batched strips against the frozen index must equal the one-shot pass")
    assert(oneShot(1L)._1 == "unique one" && oneShot(4L)._2 == 0L)
  }

  test("healthReportBy: per-scope rows reconcile with the global report; bad feed isolated") {
    import spark.implicits._
    import graft.operators.Curate
    val good = "the quick brown fox jumps over the lazy dog and then " +
      "it was the best of times it was the worst of times in the city"
    val docs = ((1 to 20).map(i => (i.toLong, "clean", s"$good $i")) ++
      (21 to 40).map(i => (i.toLong, "spam", "@@@ ### !!!")))
      .toDF("doc_id", "source", "text")
    val by = Curate.healthReportBy(docs, "text", Seq("source"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(by.keySet == Set("clean", "spam"))
    assert(by.values.map(_.getAs[Long]("n_docs")).sum ==
      Curate.healthReport(docs, "text").collect().head.getAs[Long]("n_docs"))
    assert(by("clean").getAs[Double]("gate_pass_frac") >
      by("spam").getAs[Double]("gate_pass_frac"),
      "the garbage feed must surface in its own row")
  }
}
