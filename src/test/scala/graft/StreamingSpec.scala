package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

final case class IncDoc(doc_id: Long, ts: java.sql.Timestamp, text: String)

class StreamingSpec extends SparkSpec {

  test("streaming tumbling counts equal the batch aggregation") {
    val stream = EventStreams.eventsStream(spark, Sf)
    val agg = EventStreams.tumblingCounts(stream)
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("tumbling")
      .start()
    try {
      q.processAllAvailable()
      // compare instants (unix_micros), not renderings: streaming
      // buckets are TIMESTAMP (watermark requirement), batch buckets
      // TIMESTAMP_NTZ — identical epoch under the pinned UTC session.
      val got = spark.table("tumbling")
        .select(unix_micros(col("bucket")).as("bucket"), col("event_type"), col("n"), col("total"))
      val expect = Tables.t(spark, Sf, "events")
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp").as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .select(unix_micros(col("bucket")).as("bucket"), col("event_type"), col("n"), col("total"))
      assert(got.count() == expect.count())
      assert(got.exceptAll(expect).count() == 0)
    } finally q.stop()
  }

  test("streaming bucket instants are invariant to the session time zone") {
    // pins the documented LTZ epoch-alignment claim (EventStreams
    // eventsStream): tumbling buckets denote instants, so running the
    // same query under America/New_York must emit bit-identical
    // (unix_micros, type, n, total) rows to the UTC run
    val key = "spark.sql.session.timeZone"
    def run(name: String): Set[(Long, String, Long, Double)] = {
      val q = EventStreams.tumblingCounts(EventStreams.eventsStream(spark, Sf))
        .writeStream.outputMode("complete").format("memory").queryName(name).start()
      try {
        q.processAllAvailable()
        spark.table(name)
          .select(unix_micros(col("bucket")), col("event_type"), col("n"), col("total"))
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
          .toSet
      } finally q.stop()
    }
    val utc = run("tz_utc")
    spark.conf.set(key, "America/New_York")
    val ny = try run("tz_ny") finally spark.conf.set(key, "UTC")
    assert(utc.nonEmpty && utc == ny,
      s"bucket instants drifted with the session TZ: ${(utc -- ny).take(3)} vs ${(ny -- utc).take(3)}")
  }

  test("dropDuplicatesWithinWatermark dedupes the stream") {
    import spark.implicits._
    val base = 1700000000000L
    val evs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.SessionEvent](spark)
    evs.addData(
      EventStreams.SessionEvent(1L, new java.sql.Timestamp(base)),
      EventStreams.SessionEvent(1L, new java.sql.Timestamp(base)), // dup key+ts
      EventStreams.SessionEvent(2L, new java.sql.Timestamp(base + 1000)))
    val out = EventStreams.dedupedStream(evs.toDS().toDF(), "10 minutes", Seq("user_id"))
    val q = out.writeStream.outputMode("append").format("memory").queryName("deduped").start()
    try {
      q.processAllAvailable()
      assert(spark.table("deduped").count() == 2)
    } finally q.stop()
  }

  test("streaming dedup against a static index drops known and in-stream dups") {
    import spark.implicits._
    val base = 1700000000000L
    val docs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[IncDoc](spark)
    docs.addData(
      IncDoc(101L, new java.sql.Timestamp(base), "already curated"), // in the index
      IncDoc(102L, new java.sql.Timestamp(base + 1000), "fresh doc"),
      IncDoc(103L, new java.sql.Timestamp(base + 2000), "fresh doc"), // in-stream dup
      IncDoc(104L, new java.sql.Timestamp(base + 3000), "another fresh"))
    val index = graft.operators.Dedup.exactIndex(
      Seq((1L, "already curated")).toDF("doc_id", "text"), "doc_id", "text")
    val out = EventStreams.dedupAgainstIndex(
      docs.toDS().toDF(), index, "text", "ts", "10 minutes")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("inc_dedup").start()
    try {
      q.processAllAvailable()
      val kept = spark.table("inc_dedup").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(102L, 104L),
        s"index dup 101 and in-stream dup 103 must drop, got $kept")
    } finally q.stop()
  }

  test("streaming minhash near-dup candidates equal the batch incremental pairs") {
    import spark.implicits._
    val docs = Tables.t(spark, Sf, "documents")
    val b1 = docs.filter(col("doc_id") < 250)
    val b2 = docs.filter(col("doc_id") >= 250)
    val index = graft.operators.Dedup.minhashSigs(b1, "doc_id", "text")
      .localCheckpoint() // the persisted-parquet stand-in, computed once
    val base = 1700000000000L
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[IncDoc](spark)
    stream.addData(b2.select("doc_id", "text").collect().map(r =>
      IncDoc(r.getLong(0), new java.sql.Timestamp(base + r.getLong(0)), r.getString(1))).toSeq)
    val out = EventStreams.nearDupsAgainstIndex(
      stream.toDS().toDF(), index, "doc_id", "text", "ts", "10 minutes",
      threshold = 0.5)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("near_dups").start()
    try {
      q.processAllAvailable()
      val got = spark.table("near_dups").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // the batch incremental run also reports batch-internal pairs
      // (id_a >= 250); the stream-static face covers the index×batch
      // slice — stream-internal near-dups need a stream-stream join
      val expect = graft.operators.Dedup.incrementalMinhashPairs(
          b2, index, "doc_id", "text", threshold = 0.5)
        .filter(col("id_a") < 250).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expect,
        s"stream/batch divergence: ${(got -- expect).take(3)} vs ${(expect -- got).take(3)}")
      assert(expect.nonEmpty, "testdata should contain index-side near-dups")
    } finally q.stop()
  }

  test("streaming cluster maintenance over micro-batches equals one-shot clustering") {
    import spark.implicits._
    val docs = Tables.t(spark, Sf, "documents")
    val base = 1700000000000L
    // state vars stand in for the production parquet tables;
    // localCheckpoint truncates lineage like a parquet round-trip would
    var sigs = graft.operators.Dedup.minhashSigs(docs.limit(0), "doc_id", "text")
      .localCheckpoint()
    var labels = sigs.select(col("id"), col("id").as("comp")).localCheckpoint()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[IncDoc](spark)
    val q = EventStreams.clusterMaintainingSink(
      stream.toDS().toDF(), "doc_id", "text",
      loadState = () => (sigs, labels),
      saveState = (s, l) => { sigs = s.localCheckpoint(); labels = l.localCheckpoint() },
      threshold = 0.5)
    try {
      def feed(df: org.apache.spark.sql.DataFrame): Unit = {
        stream.addData(df.select("doc_id", "text").collect().map(r =>
          IncDoc(r.getLong(0), new java.sql.Timestamp(base + r.getLong(0)), r.getString(1))).toSeq)
        q.processAllAvailable()
      }
      feed(docs.filter(col("doc_id") < 250))   // micro-batch 1
      feed(docs.filter(col("doc_id") >= 250))  // micro-batch 2
      val streamed = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val oneShot = graft.operators.DedupCluster.connectedComponents(
        graft.operators.Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == oneShot,
        s"diff: ${(streamed.toSet -- oneShot.toSet).take(3)} vs ${(oneShot.toSet -- streamed.toSet).take(3)}")
      assert(sigs.count() == docs.count(), "index must hold one signature per doc")
    } finally q.stop()
  }

  test("streaming weighted sample == batch draw over the rows seen so far, any batching") {
    import spark.implicits._
    val rows = (1 to 400).map { i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", if (i <= 40) 50.0 else 1.0)
    }
    def batchDraw(rs: Seq[(Long, String, Double)]): Map[String, Set[String]] =
      graft.operators.Sampling.weightedSampleByStratum(
          rs.toDF("id", "s", "w"), col("id"), col("w"), col("s"), nPerStratum = 15)
        .select("s", "id").collect()
        .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1).toString).toSet).toMap
    def run(splits: Seq[Seq[(Long, String, Double)]]): Seq[Map[String, Set[String]]] = {
      var latest = Map.empty[String, Set[String]]
      val snapshots = scala.collection.mutable.ArrayBuffer.empty[Map[String, Set[String]]]
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, Double)](spark)
      val q = EventStreams.weightedSampleStream(
          stream.toDS().toDF("id", "s", "w"),
          col("id"), col("w"), col("s"), nPerStratum = 15)
        .writeStream.outputMode("update")
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[EventStreams.StratumSample], _: Long) =>
            latest ++= b.collect().map(s => s.stratum -> s.ids.toSet)
        }.start()
      try splits.foreach { part =>
        stream.addData(part); q.processAllAvailable(); snapshots += latest
      } finally q.stop()
      snapshots.toSeq
    }
    val snaps = run(Seq(rows.take(150), rows.drop(150)))
    // after each micro-batch the maintained sample equals the batch
    // draw over exactly the rows seen so far — the shared E-S key
    // makes the reservoir path-independent
    assert(snaps(0) == batchDraw(rows.take(150)))
    assert(snaps(1) == batchDraw(rows))
    // and the final sample is invariant to how the stream was batched
    val other = run(Seq(rows.take(37), rows.slice(37, 290), rows.drop(290)))
    assert(other.last == snaps(1))
  }

  test("frozen-model trigram scoring over micro-batches equals the batch path") {
    import spark.implicits._
    // the production shape for LM quality scoring on an ingest stream:
    // the reference model is a frozen parquet table (trained once),
    // each micro-batch scores against it via foreachBatch — per-doc
    // scores depend only on the doc and the model, so batch boundaries
    // cannot change any score
    val docs = Tables.t(spark, Sf, "documents")
      .filter(col("doc_id") < 120).select("doc_id", "text")
    val model = graft.operators.Vocab
      .trigramModel(docs, "doc_id", "text").localCheckpoint()
    var scored = Map.empty[Long, (Double, Long)]
    val base = 1700000000000L
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[IncDoc](spark)
    val q = stream.toDS().toDF().writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        scored ++= graft.operators.Vocab
          .lmScoreTrigramWith(batch, "doc_id", "text", model)
          .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2))))
    }.start()
    try {
      def feed(df: org.apache.spark.sql.DataFrame): Unit = {
        stream.addData(df.select("doc_id", "text").collect().map(r =>
          IncDoc(r.getLong(0), new java.sql.Timestamp(base + r.getLong(0)), r.getString(1))).toSeq)
        q.processAllAvailable()
      }
      feed(docs.filter(col("doc_id") < 60))
      feed(docs.filter(col("doc_id") >= 60))
      val oneShot = graft.operators.Vocab
        .lmScoreTrigramWith(docs, "doc_id", "text", model)
        .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
      assert(scored == oneShot,
        s"streamed scores diverge: ${(scored.toSet -- oneShot.toSet).take(3)}")
    } finally q.stop()
  }

  test("stream-static enrichment attaches dimension columns per batch") {
    import spark.implicits._
    val evs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.SessionEvent](spark)
    evs.addData(
      EventStreams.SessionEvent(1L, new java.sql.Timestamp(1700000000000L)),
      EventStreams.SessionEvent(9L, new java.sql.Timestamp(1700000001000L)))
    val dim = Seq((1L, "gold")).toDF("user_id", "tier")
    val q = EventStreams.enrich(evs.toDS().toDF(), dim, "user_id")
      .writeStream.outputMode("append").format("memory").queryName("enriched").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(2)) null else r.getString(2))).toMap
      assert(rows == Map(1L -> "gold", 9L -> null)) // left join keeps unmatched
    } finally q.stop()
  }

  test("stream-stream interval join pairs within the window only") {
    import spark.implicits._
    val base = 1700000000000L
    def ts(off: Long) = new java.sql.Timestamp(base + off)
    val clicks = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.SessionEvent](spark)
    val buys = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.SessionEvent](spark)
    clicks.addData(
      EventStreams.SessionEvent(1L, ts(0)),
      EventStreams.SessionEvent(2L, ts(0)))
    buys.addData(
      EventStreams.SessionEvent(1L, ts(5 * 60000)),   // in window
      EventStreams.SessionEvent(1L, ts(120 * 60000)), // past window
      EventStreams.SessionEvent(3L, ts(60000)))       // other key
    val out = EventStreams.intervalJoin(
      clicks.toDS().toDF(), buys.toDS().toDF(), "user_id", "10 minutes")
    val q = out.writeStream.outputMode("append").format("memory").queryName("ssjoin").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("ssjoin").collect()
        .map(r => (r.getLong(0), r.getTimestamp(2).getTime - base))
      assert(rows.toSet == Set((1L, 5 * 60000L)))
    } finally q.stop()
  }

  test("streaming as-of enrichment: buffered facts wait for late reference rows") {
    import spark.implicits._
    val base = 1700000000000L
    def min(m: Long) = new java.sql.Timestamp(base + m * 60000)
    val facts = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.AsOfEvent](spark)
    val refs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.AsOfEvent](spark)
    val q = EventStreams.asOfEnrich(facts.toDS(), refs.toDS(), lateness = "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("asof_enrich").start()
    try {
      // batch 1: an early ref, a fact before any ref, the fact under test
      refs.addData(EventStreams.AsOfEvent(1L, min(0), 1.0))
      facts.addData(
        EventStreams.AsOfEvent(1L, min(-5), 3.0), // no ref at-or-before
        EventStreams.AsOfEvent(1L, min(60), 5.0))
      q.processAllAvailable() // watermark after: min(60) - 10
      // batch 2: a LATE ref that belongs between min(0) and min(60) —
      // the min(60) fact is still buffered and must match it
      refs.addData(EventStreams.AsOfEvent(1L, min(55), 2.0))
      facts.addData(EventStreams.AsOfEvent(1L, min(90), 7.0))
      q.processAllAvailable() // watermark after: min(90) - 10
      // batch 3: advance the key so buffered facts <= watermark drain
      facts.addData(EventStreams.AsOfEvent(1L, min(150), 9.0))
      q.processAllAvailable() // watermark after: min(150) - 10
      facts.addData(EventStreams.AsOfEvent(1L, min(200), 0.0))
      q.processAllAvailable()
      val got = spark.table("asof_enrich").as[EventStreams.AsOfEnriched].collect()
        .map(e => ((e.ts.getTime - base) / 60000, e.v, e.ref_v)).toSet
      // min(150)/min(200) stay buffered: the final watermark (min 190)
      // hasn't passed min(200), and min(150) drained nothing earlier
      assert(got == Set(
        (-5L, 3.0, None),       // fact before any reference
        (60L, 5.0, Some(2.0)),  // late ref at min(55) wins over min(0)
        (90L, 7.0, Some(2.0))), s"got $got")
    } finally q.stop()
  }

  test("sessionize survives late cross-batch events without corrupting state") {
    import spark.implicits._
    val base = 1700000000000L
    def ev(off: Long) = EventStreams.SessionEvent(1L, new java.sql.Timestamp(base + off))
    val evs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.SessionEvent](spark)
    val q = EventStreams.sessionize(evs.toDS(), gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("late_sessions").start()
    try {
      evs.addData(ev(0), ev(60000))
      q.processAllAvailable()
      // batch 2: one orphan far in the past + one event past the gap
      evs.addData(ev(-90 * 60000), ev(100 * 60000))
      q.processAllAvailable()
      val got = spark.table("late_sessions").as[EventStreams.Session].collect()
        .map(s => (s.session_start.getTime - base, s.n_events)).toSet
      // the orphan closes alone; the open session closes with BOTH its
      // events and its original start (the old code merged the orphan,
      // dragged `last` back 90min, then mis-closed with start=0, n=3)
      assert(got == Set((-90 * 60000L, 1), (0L, 2)), s"got $got")
    } finally q.stop()
  }

  test("streaming parquet file sink: exactly-once restartable output") {
    // the production sink path: append to a parquet directory with a
    // checkpoint; a second run over the same checkpoint must not
    // duplicate rows (file sink commits via the checkpointed log)
    import spark.implicits._
    val out = "/tmp/graft_stream_sink/out"
    val chk = "/tmp/graft_stream_sink/chk"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("/tmp/graft_stream_sink"))
    val evs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.SessionEvent](spark)
    evs.addData(
      EventStreams.SessionEvent(1L, new java.sql.Timestamp(1700000000000L)),
      EventStreams.SessionEvent(2L, new java.sql.Timestamp(1700000001000L)))
    def run(): Unit = {
      val q = evs.toDS().toDF().writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", chk)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() == 2)
    // restart against the same checkpoint: already-committed batches
    // are not re-emitted, new data flows through
    evs.addData(EventStreams.SessionEvent(3L, new java.sql.Timestamp(1700000002000L)))
    run()
    val rows = spark.read.parquet(out)
    assert(rows.count() == 3, "restart duplicated or dropped committed batches")
    assert(rows.select("user_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("sessionize closes sessions on gap") {
    import spark.implicits._
    val base = 1700000000000L
    val evs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.SessionEvent](spark)
    evs.addData(
      EventStreams.SessionEvent(1L, new java.sql.Timestamp(base)),
      EventStreams.SessionEvent(1L, new java.sql.Timestamp(base + 60000)),
      EventStreams.SessionEvent(1L, new java.sql.Timestamp(base + 100 * 60000)), // new session
      EventStreams.SessionEvent(2L, new java.sql.Timestamp(base)))
    val out = EventStreams.sessionize(evs.toDS(), gapMinutes = 30)
    val q = out.writeStream.outputMode("append").format("memory").queryName("sessions").start()
    try {
      q.processAllAvailable()
      // first session of user 1 closed by the later event (2 events)
      val closed = spark.table("sessions").as[EventStreams.Session].collect()
      assert(closed.exists(s => s.user_id == 1L && s.n_events == 2))
    } finally q.stop()
  }

  test("the Bloom decontamination prefilter runs unchanged on a stream") {
    // the sketch probe is a stateless Column over a task-serialized
    // sketch: in-stream batches drop probe-overlapping docs at the scan
    // with zero streaming state — the streaming half of
    // decontaminateBloom (exact confirm joins run batch-side)
    import spark.implicits._
    import graft.operators.Dedup
    import graft.plans.{BloomColumns, TextHashColumns}
    val probes = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val bf = Dedup.probeSketch(probes, "text", shingleN = 5)
    val docs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    docs.addData(
      (100L, "intro words then alpha beta gamma delta epsilon zeta quoted inside"),
      (101L, "a fully unrelated document body with distinct vocabulary throughout"))
    val q = docs.toDF().toDF("doc_id", "text")
      .filter(!BloomColumns.anyContained(
        TextHashColumns.shingleHashes(col("text"), 5), bf))
      .writeStream.outputMode("append").format("memory")
      .queryName("bloom_prefiltered").start()
    try {
      q.processAllAvailable()
      val kept = spark.table("bloom_prefiltered")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(101L),
        "stream prefilter must drop exactly the probe-overlapping doc")
    } finally q.stop()
  }

  test("the curation quality gate runs unchanged on a stream") {
    // the gate (and every stateless text/sampling kernel) is a pure
    // Column expression, so the same code curates a micro-batch stream
    // with no batch/stream divergence
    import spark.implicits._
    import graft.functions.{TextFunctions => TF}
    val docs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    docs.addData(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "short one"))
    val q = docs.toDF().toDF("doc_id", "text")
      .filter(TF.filterReason(col("text")) === "ok")
      .writeStream.outputMode("append").format("memory").queryName("gated").start()
    try {
      q.processAllAvailable()
      val kept = spark.table("gated").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L), "stream gate must keep exactly the batch-kept docs")
    } finally q.stop()
  }

  test("line signals and the trie replacer run unchanged on a stream") {
    // both are stateless scan-local kernels — streaming them is free
    import spark.implicits._
    import graft.functions.{TextFunctions => TF}
    val docs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    docs.addData((1L, "- bullet\nplain spark line\nplain spark line"))
    val q = docs.toDF().toDF("doc_id", "text")
      .select(
        col("doc_id"),
        TF.bulletLineRatio(col("text")).as("b"),
        TF.dupLineRatio(col("text")).as("d"),
        graft.plans.StringColumns.replaceMany(col("text"),
          Seq("spark" -> "[X]")).as("scrubbed"))
      .writeStream.outputMode("append").format("memory").queryName("linesig").start()
    try {
      q.processAllAvailable()
      val r = spark.table("linesig").collect()(0)
      assert(math.abs(r.getDouble(1) - 1.0 / 3) < 1e-12)
      assert(math.abs(r.getDouble(2) - 1.0 / 3) < 1e-12)
      assert(r.getString(3).contains("[X]") && !r.getString(3).contains("spark"))
    } finally q.stop()
  }

  test("frozen DSIR scoring streams statelessly and matches the batch column row-for-row") {
    // the persisted-model pattern: fit the bucket log-ratio table once
    // in batch, freeze it into the scan-local scoring column, and run
    // the SAME column on a standing ingest — zero joins, zero state,
    // so every prefix trivially equals the batch scores
    import spark.implicits._
    import graft.operators.Sampling
    val target = (1L to 10L).map(i => (i, "zebra yak xylophone zebra"))
      .toDF("doc_id", "text")
    val raw = ((100L to 109L).map(i => (i, "zebra yak xylophone yak")) ++
      (200L to 209L).map(i => (i, "invoice ledger accrual ledger")))
      .toDF("doc_id", "text")
    val ratios = Sampling.dsirRatioTable(raw, target, "text", buckets = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val rows = Seq((100L, "zebra yak xylophone yak"),
      (200L, "invoice ledger accrual ledger"),
      (300L, "zebra ledger"))
    val batch = rows.toDF("doc_id", "text")
      .select(col("doc_id"), Sampling.dsirScoreFrozen(ratios, col("text"), 64).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val docs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    docs.addData(rows: _*)
    val q = docs.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), Sampling.dsirScoreFrozen(ratios, col("text"), 64).as("s"))
      .writeStream.outputMode("append").format("memory").queryName("dsirfrozen").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("dsirfrozen").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(streamed == batch,
        s"streamed frozen scores must equal batch: $streamed vs $batch")
    } finally q.stop()
  }

  test("frozen by-domain DSIR scoring streams statelessly and matches the batch table row-for-row") {
    // the by-domain analogue of the frozen-scoring contract: the
    // domain×bucket grid is fitted once in batch, frozen into the
    // scan-local array<struct> column, and the SAME column (plus a
    // stateless explode) runs on a standing ingest — zero joins, zero
    // state, so every prefix equals the batch (doc, domain) table
    import spark.implicits._
    import graft.operators.Sampling
    val target = ((1L to 10L).map(i => (i, "news", "zebra yak xylophone zebra")) ++
      (11L to 20L).map(i => (i, "finance", "invoice ledger accrual ledger")))
      .toDF("doc_id", "lang", "text")
    val raw = ((100L to 109L).map(i => (i, "zebra yak xylophone yak")) ++
      (200L to 209L).map(i => (i, "invoice ledger accrual ledger")))
      .toDF("doc_id", "text")
    val grid = Sampling.dsirDomainGrid(raw, target, "text", "lang", buckets = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val rows = Seq((100L, "zebra yak xylophone yak"),
      (200L, "invoice ledger accrual ledger"),
      (300L, "zebra ledger"))
    def score(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"),
        explode(Sampling.dsirScoreFrozenByDomain(grid, col("text"), 64)).as("s"))
      .select(col("doc_id"), col("s.domain"), col("s.logw"))
    val batch = score(rows.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val docs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    docs.addData(rows: _*)
    val q = score(docs.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory").queryName("dsirfrozendom").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("dsirfrozendom").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
      assert(streamed == batch,
        s"streamed frozen by-domain scores must equal batch: $streamed vs $batch")
    } finally q.stop()
  }

  test("mojibake repair and n-gram repetition kernels run unchanged on a stream") {
    // both are stateless scan-local kernels — a standing ingest cleans
    // encoding and scores repetition with zero streaming state
    import spark.implicits._
    import graft.functions.{TextFunctions => TF}
    val moji = graft.plans.Mojibake.utf8AsCp1252("café — déjà")
    val docs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    docs.addData((1L, s"prefix $moji"), (2L, "a b a b a b c"))
    val q = docs.toDF().toDF("doc_id", "text")
      .select(
        col("doc_id"),
        TF.fixMojibake(col("text")).as("fixed"),
        graft.plans.TextHashColumns.ngramDupStats(col("text"), 3).as("g3"))
      .writeStream.outputMode("append").format("memory").queryName("mojirep").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("mojirep").collect().map(r => r.getLong(0) -> r).toMap
      assert(rows(1L).getString(1) == "prefix café — déjà")
      assert(rows(2L).getStruct(2).getInt(1) == 2, "3-gram dup count on stream")
    } finally q.stop()
  }

  test("streaming ANN index append: ivfAssign + PQ encode equal the batch path") {
    // the standing-ingest shape for the persisted ANN indexes: new
    // embedding batches assign to FROZEN centroids (pure Column
    // expressions) and encode against the FROZEN PQ codebook
    // (stateless mapPartitions) — both run unchanged on a stream, so
    // the index grows without re-training or touching history
    import spark.implicits._
    val emb = spark.read.parquet(s"$Sf/embeddings.parquet").limit(64)
      .select(col("vec_id"), col("embedding"))
    val rows = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val centroids = Array(
      Array.fill(64)(0.1), Array.tabulate(64)(i => if (i < 32) 1.0 else -1.0),
      Array.tabulate(64)(i => math.sin(i.toDouble)))
    val cb = graft.operators.Pq.train(emb, "vec_id", "embedding", m = 8, ksub = 4)

    val batchAssign = graft.operators.Similarity.ivfAssign(emb, "vec_id", "embedding", centroids)
      .select("cid", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batchCodes = graft.operators.Pq.encode(emb, "vec_id", "embedding", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap

    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])](spark)
    stream.addData(rows.take(32).toSeq)
    stream.addData(rows.drop(32).toSeq)
    val streamed = stream.toDF().toDF("vec_id", "embedding")
    val assignQ = graft.operators.Similarity
      .ivfAssign(streamed, "vec_id", "embedding", centroids)
      .writeStream.outputMode("append").format("memory").queryName("ann_assign").start()
    val encodeQ = graft.operators.Pq.encode(streamed, "vec_id", "embedding", cb)
      .writeStream.outputMode("append").format("memory").queryName("ann_codes").start()
    try {
      assignQ.processAllAvailable()
      encodeQ.processAllAvailable()
      val sa = spark.table("ann_assign").select("cid", "cell")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val sc = spark.table("ann_codes")
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(sa == batchAssign, "streamed cell assignment == batch ivfAssign")
      assert(sc == batchCodes, "streamed PQ codes == batch encode")
    } finally { assignQ.stop(); encodeQ.stop() }
  }

  test("streaming recrawl monitor: newOrChanged on a stream equals the batch diff minus removed") {
    import spark.implicits._
    import graft.operators.Snapshot
    val docs = Tables.t(spark, Sf, "documents")
    val old = docs.filter(col("doc_id") % 3 =!= 0)
    val cur = docs.filter(col("doc_id") % 5 =!= 0)
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" v2"))).otherwise(col("text")))
    val index = Snapshot.hashIndex(old, "doc_id", "text").localCheckpoint()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    stream.addData(cur.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq)
    val q = Snapshot.newOrChanged(stream.toDS().toDF("doc_id", "text"), index, "doc_id", "text")
      .writeStream.outputMode("append").format("memory").queryName("recrawl").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("recrawl")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      val batch = Snapshot.diff(old, cur, "doc_id", "text")
        .filter(col("status") =!= "removed")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(streamed == batch && batch.nonEmpty,
        "streamed added/changed must equal the batch diff minus removed")
    } finally q.stop()
  }

  test("streaming per-stratum drift: cumulative table equals the batch drift at every prefix") {
    import spark.implicits._
    import graft.operators.Vocab
    val docs = Tables.t(spark, Sf, "documents")
    val ref = Vocab.stratumTokenCounts(docs, "lang", "text").localCheckpoint()
    var counts = Vocab.stratumTokenCounts(docs.limit(0), "lang", "text").localCheckpoint()
    var emitted = Seq.empty[Map[String, (Double, Double, Double)]]
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)](spark)
    def toMap(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val q = EventStreams.stratumDriftMonitoringSink(
      stream.toDS().toDF("doc_id", "lang", "text"), "lang", "text", ref,
      loadCounts = () => counts,
      saveCounts = c => counts = c.localCheckpoint(),
      emit = d => emitted = emitted :+ toMap(d))
    try {
      def feed(part: org.apache.spark.sql.DataFrame): Unit = {
        stream.addData(part.select("doc_id", "lang", "text").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq)
        q.processAllAvailable()
      }
      feed(docs.filter(col("doc_id") < 100))
      feed(docs.filter(col("doc_id") >= 100 && col("doc_id") < 200))
      def batchAt(pred: org.apache.spark.sql.Column) = toMap(
        Vocab.driftByStratumCounts(ref,
          Vocab.stratumTokenCounts(docs.filter(pred), "lang", "text")))
      assert(emitted == Seq(
        batchAt(col("doc_id") < 100),
        batchAt(col("doc_id") < 200)),
        "every prefix's streamed per-stratum drift must equal the batch table")
    } finally q.stop()
  }

  test("streaming health monitor: cumulative dashboard equals the batch report at every prefix") {
    import spark.implicits._
    import graft.operators.Curate
    val docs = Tables.t(spark, Sf, "documents")
    var sums = Curate.healthSums(docs.limit(0), "text").localCheckpoint()
    var emitted = Seq.empty[Seq[Any]]
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    val q = EventStreams.healthMonitoringSink(
      stream.toDS().toDF("doc_id", "text"), "text",
      loadSums = () => sums,
      saveSums = s => sums = s.localCheckpoint(),
      emit = d => emitted = emitted :+ d.collect().head.toSeq)
    try {
      def feed(part: org.apache.spark.sql.DataFrame): Unit = {
        stream.addData(part.select("doc_id", "text").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq)
        q.processAllAvailable()
      }
      feed(docs.filter(col("doc_id") < 100))
      feed(docs.filter(col("doc_id") >= 100 && col("doc_id") < 200))
      def batchAt(pred: org.apache.spark.sql.Column) =
        Curate.healthReport(docs.filter(pred), "text").collect().head.toSeq
      assert(emitted == Seq(
        batchAt(col("doc_id") < 100),
        batchAt(col("doc_id") < 200)),
        "every prefix's streamed dashboard must equal the batch report")
    } finally q.stop()
  }

  test("streaming profile monitor: cumulative ANALYZE equals the batch profile at every prefix") {
    import spark.implicits._
    import graft.operators.Profile
    val docs = Tables.t(spark, Sf, "documents")
    val cols = Seq("text", "lang")
    var sums = Profile.profileSums(docs.limit(0), cols).localCheckpoint()
    var emitted = Seq.empty[Map[String, Seq[Any]]]
    def toMap(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)](spark)
    val q = EventStreams.profileMonitoringSink(
      stream.toDS().toDF("doc_id", "text", "lang"), cols,
      loadSums = () => sums,
      saveSums = s => sums = s.localCheckpoint(),
      emit = d => emitted = emitted :+ toMap(d))
    try {
      def feed(part: org.apache.spark.sql.DataFrame): Unit = {
        stream.addData(part.select("doc_id", "text", "lang").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq)
        q.processAllAvailable()
      }
      feed(docs.filter(col("doc_id") < 100))
      feed(docs.filter(col("doc_id") >= 100 && col("doc_id") < 200))
      def batchAt(pred: org.apache.spark.sql.Column) = toMap(
        Profile.finalizeProfile(Profile.profileSums(docs.filter(pred), cols)))
      assert(emitted == Seq(
        batchAt(col("doc_id") < 100),
        batchAt(col("doc_id") < 200)),
        "every prefix's streamed profile must equal the batch ANALYZE")
    } finally q.stop()
  }

  test("streaming drift monitor: cumulative summary equals the batch drift at every prefix") {
    import spark.implicits._
    import graft.operators.Vocab
    val docs = Tables.t(spark, Sf, "documents")
    val ref = Vocab.tokenCounts(docs.filter(col("lang") === "en"), "text").localCheckpoint()
    var counts = Vocab.tokenCounts(docs.limit(0), "text").localCheckpoint()
    var emitted = Seq.empty[(Double, Double, Double)]
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    val q = EventStreams.driftMonitoringSink(
      stream.toDS().toDF("doc_id", "text"), "text", ref,
      loadCounts = () => counts,
      saveCounts = c => counts = c.localCheckpoint(),
      emit = d => emitted = emitted :+ {
        val r = d.collect().head
        (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      })
    try {
      def feed(part: org.apache.spark.sql.DataFrame): Unit = {
        stream.addData(part.select("doc_id", "text").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq)
        q.processAllAvailable()
      }
      feed(docs.filter(col("doc_id") < 100))
      feed(docs.filter(col("doc_id") >= 100 && col("doc_id") < 200))
      def batchAt(pred: org.apache.spark.sql.Column) = {
        val r = Vocab.driftSummaryCounts(ref,
          Vocab.tokenCounts(docs.filter(pred), "text")).collect().head
        (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      }
      assert(emitted == Seq(
        batchAt(col("doc_id") < 100),
        batchAt(col("doc_id") < 200)),
        "every prefix's streamed summary must equal the batch computation")
    } finally q.stop()
  }

  test("streaming mixture-epoch planner: prefix plan equals batch mixturePlan, parquet state backend") {
    import spark.implicits._
    import graft.operators.Sampling
    import graft.functions.{TextFunctions => TF}
    val weights = Map("en" -> 0.6, "de" -> 0.4)
    val docs = Tables.t(spark, Sf, "documents")
      .select(col("doc_id"), col("lang"),
        TF.tokenCount(col("text")).cast("long").as("n_tok"))
    // REAL overwrite-in-place parquet state — the backend the sink
    // docstrings recommend. Before the sinks materialized `merged`
    // ahead of saveCounts, this exact shape double-counted (emit
    // recomputed the lazy merge over the just-overwritten path), so
    // this test pins the materialize-before-save contract.
    val stateDir = java.nio.file.Files.createTempDirectory("mixstate").toString
    Sampling.domainTokenCounts(docs.limit(0), col("lang"), "n_tok")
      .write.mode("overwrite").parquet(stateDir)
    var emitted = Seq.empty[Set[Seq[Any]]]
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)](spark)
    val q = EventStreams.mixturePlanMonitoringSink(
      stream.toDS().toDF("doc_id", "lang", "n_tok"), "lang", "n_tok",
      weights, totalTokens = 50000L, maxEpochs = 2.0,
      loadCounts = () => spark.read.parquet(stateDir),
      saveCounts = c => c.write.mode("overwrite").parquet(stateDir),
      emit = d => emitted = emitted :+ d.collect().map(_.toSeq).toSet)
    try {
      def feed(pred: org.apache.spark.sql.Column): Unit = {
        stream.addData(docs.filter(pred).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq)
        q.processAllAvailable()
      }
      feed(col("doc_id") < 100)
      feed(col("doc_id") >= 100 && col("doc_id") < 250)
      def batchAt(pred: org.apache.spark.sql.Column) =
        Sampling.mixturePlan(docs.filter(pred), col("lang"), "n_tok",
          weights, 50000L, 2.0).collect().map(_.toSeq).toSet
      assert(emitted == Seq(
        batchAt(col("doc_id") < 100),
        batchAt(col("doc_id") < 250)),
        "every prefix's streamed epoch plan must equal the batch planner")
    } finally q.stop()
  }

  test("URL canonicalization and the domain blocklist filter run unchanged on a stream") {
    // canonicalUrl is a stateless Column kernel; blocklistFilter is a
    // stream-static broadcast ANTI-join — both legal in streaming, so
    // the URL curation stage needs no batch/stream fork
    import spark.implicits._
    import graft.functions.{TextFunctions => TF}
    val docs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    docs.addData(
      (1L, "HTTPS://Ads.Tracker.COM:443/x/?utm_source=a&q=1"),
      (2L, "https://good.org/page/"),
      (3L, "http://sub.tracker.com:80/y"))
    val blocklist = Seq("tracker.com").toDF("domain")
    val q = graft.operators.Curate.blocklistFilter(
        docs.toDF().toDF("doc_id", "url")
          .withColumn("curl", TF.canonicalUrl(col("url"))),
        "url", blocklist)
      .writeStream.outputMode("append").format("memory").queryName("urlcur").start()
    try {
      q.processAllAvailable()
      val kept = spark.table("urlcur").select("doc_id", "curl")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(kept == Map(2L -> "https://good.org/page"),
        s"stream blocklist must keep exactly the batch-kept docs: $kept")
    } finally q.stop()
  }

  test("streaming contamination triage equals the batch scorer under any batching") {
    import spark.implicits._
    // frozen benchmark index built once from a probe slice; per-doc
    // scores depend only on the doc and the index, so batch boundaries
    // cannot change any score
    val all = Tables.t(spark, Sf, "documents").select("doc_id", "text")
    val index = graft.operators.Dedup
      .benchShingleIndex(all.filter(col("doc_id") % 20 === 0), "text", shingleN = 3)
      .localCheckpoint()
    val corpus = all.filter(col("doc_id") % 20 =!= 0 && col("doc_id") < 100)
    var scored = Map.empty[Long, (Long, Long, Double)]
    val base = 1700000000000L
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[IncDoc](spark)
    val q = EventStreams.contaminationScoringSink(
      stream.toDS().toDF(), index, "doc_id", "text", 3,
      out => scored ++= out.collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))))
    try {
      def feed(df: org.apache.spark.sql.DataFrame): Unit = {
        stream.addData(df.collect().map(r =>
          IncDoc(r.getLong(0), new java.sql.Timestamp(base + r.getLong(0)), r.getString(1))).toSeq)
        q.processAllAvailable()
      }
      feed(corpus.filter(col("doc_id") < 50))
      feed(corpus.filter(col("doc_id") >= 50))
      val oneShot = graft.operators.Dedup
        .contaminationScoreAgainstIndex(corpus, index, "doc_id", "text", 3)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      assert(scored == oneShot,
        s"streamed contamination diverges: ${(scored.toSet -- oneShot.toSet).take(3)}")
      assert(scored.nonEmpty)
    } finally q.stop()
  }
}
