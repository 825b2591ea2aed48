package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.core.SeriesSpec
import graft.ext.Sessionize
import graft.streaming.StreamingQc
import graft.streaming.StreamingQc.SeriesEvent

class StreamingSpec extends SparkTestBase {

  private def us(minutes: Long): Long = minutes * 60L * 1000000L

  test("streaming gap flags: first post-gap sample masked, state spans batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[SeriesEvent]
    val q = StreamingQc.gapFlags(input.toDS(), gapHours = 2.0)
      .writeStream.format("memory").queryName("gapsout")
      .outputMode("append").start()
    try {
      input.addData(
        SeriesEvent("s1", us(0), 1.0),
        SeriesEvent("s1", us(15), 2.0),
        SeriesEvent("s1", us(300), 3.0)) // 4h45 after prev -> gap
      q.processAllAvailable()
      // second batch continues from the first batch's state
      input.addData(SeriesEvent("s1", us(315), 4.0), // 15min -> fine
        SeriesEvent("s1", us(800), 5.0))             // ~8h -> gap
      q.processAllAvailable()
      val rows = spark.table("gapsout").orderBy("tsUs").collect()
      assert(rows.map(_.getAs[Boolean]("isGap")).toSeq ==
        Seq(false, false, true, false, true))
      assert(rows(2).isNullAt(rows(2).fieldIndex("value"))) // masked
      assert(rows(3).getAs[Double]("value") == 4.0)
    } finally q.stop()
  }

  test("streaming flat runs close on value change, continue across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[SeriesEvent]
    val q = StreamingQc.flatRunEvents(input.toDS(), minHours = 2.0)
      .writeStream.format("memory").queryName("runsout")
      .outputMode("append").start()
    try {
      // batch 1: start a constant run (3 samples of 5.0, hourly)
      input.addData((0 to 2).map(i => SeriesEvent("s1", us(60L * i), 5.0)): _*)
      q.processAllAvailable()
      assert(spark.table("runsout").count() == 0) // still open
      // batch 2: extend by 2 more, then change value -> run closes
      input.addData(
        SeriesEvent("s1", us(180), 5.0), SeriesEvent("s1", us(240), 5.0),
        SeriesEvent("s1", us(300), 7.0))
      q.processAllAvailable()
      val runs = spark.table("runsout").collect()
      assert(runs.length == 1)
      val r = runs.head
      assert(r.getAs[Long]("startUs") == us(0) && r.getAs[Long]("endUs") == us(240))
      assert(r.getAs[Int]("n") == 5 && r.getAs[Double]("value") == 5.0)
      // short run (1h) closed by another change -> below minHours, dropped
      input.addData(SeriesEvent("s1", us(360), 7.0), SeriesEvent("s1", us(420), 9.0))
      q.processAllAvailable()
      assert(spark.table("runsout").count() == 1)
    } finally q.stop()
  }

  test("streaming sessionization: gap closes on arrival, watermark closes the tail") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // base offset: an event AT the initial watermark (epoch 0) would
    // be dropped as late before reaching the stateful operator
    val base = 1000L
    def t(minutes: Long) = new java.sql.Timestamp((base + minutes) * 60000L)
    def bus(minutes: Long) = us(base + minutes)
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val df = input.toDF().toDF("user_id", "ts").withWatermark("ts", "0 seconds")
    val q = StreamingQc.sessionStream(df, "user_id", "ts",
      gapUs = us(30)) // 30-minute gap
      .writeStream.format("memory").queryName("sessout")
      .outputMode("append").start()
    try {
      // batch 1: open u1's first session
      input.addData((1L, t(0)), (1L, t(10)))
      q.processAllAvailable()
      assert(spark.table("sessout").count() == 0) // still open
      // batch 2: u1 continues within the gap ACROSS batches, then a
      // far event closes session 1 on arrival and opens session 2
      input.addData((1L, t(25)), (1L, t(120)), (2L, t(26)))
      q.processAllAvailable()
      // u1's first session closes on ARRIVAL of the far event; u2's
      // singleton closes by TIMEOUT in the same trigger cycle (the
      // batch's own watermark advance, base+120, passes 26+gap)
      val closed = spark.table("sessout").as[StreamingQc.SessionWindow]
        .collect.toSeq.sortBy(_.userId)
      assert(closed == Seq(
        StreamingQc.SessionWindow(1L, bus(0), bus(25), 3L),
        StreamingQc.SessionWindow(2L, bus(26), bus(26), 1L)))
      // batch 3: a far-future event advances the watermark past every
      // open session's end + gap -> timeouts flush them
      input.addData((99L, t(100000)))
      q.processAllAvailable()
      val all = spark.table("sessout").as[StreamingQc.SessionWindow]
        .collect.toSeq.sortBy(s => (s.userId, s.startUs))
      assert(all == Seq(
        StreamingQc.SessionWindow(1L, bus(0), bus(25), 3L),
        StreamingQc.SessionWindow(1L, bus(120), bus(120), 1L),
        StreamingQc.SessionWindow(2L, bus(26), bus(26), 1L)),
        s"got $all")
    } finally q.stop()
  }

  test("streaming sessionization equals the batch operator on a replayed log") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // deterministic irregular log: 4 users, gaps straddling 30 min
    val log = for (u <- 1L to 4L; i <- 0 until 12)
      yield (u, (i * i * 7L + u * 3L) % 500L) // minutes
    def t(minutes: Long) = new java.sql.Timestamp(minutes * 60000L)
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val df = input.toDF().toDF("user_id", "ts").withWatermark("ts", "0 seconds")
    val q = StreamingQc.sessionStream(df, "user_id", "ts", gapUs = us(30))
      .writeStream.format("memory").queryName("sesseq")
      .outputMode("append").start()
    try {
      // replay in event-time order split across three batches (the
      // in-order-per-user contract), then flush with a sentinel
      val ordered = log.sortBy(_._2).map { case (u, m) => (u, t(m)) }
      ordered.grouped((ordered.size + 2) / 3).foreach { b =>
        input.addData(b: _*); q.processAllAvailable()
      }
      input.addData((999L, t(1000000L))); q.processAllAvailable()
      val streamed = spark.table("sesseq").as[StreamingQc.SessionWindow]
        .collect.toSeq.filter(_.userId != 999L)
        .map(s => (s.userId, s.startUs, s.endUs, s.nEvents)).sorted
      val batch = graft.ext.Sessionize.sessionize(
        log.toDF("user_id", "mins")
          .select(col("user_id"), timestamp_micros(col("mins") * 60000000L).as("ts")),
        "user_id", "ts", gapUs = us(30))
        .select("user_id", "start_us", "end_us", "n_events")
        .as[(Long, Long, Long, Long)].collect.toSeq.sorted
      assert(streamed == batch)
    } finally q.stop()
  }

  test("windowed coverage counts observed vs finite per hour window") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, java.sql.Timestamp, java.lang.Double)]
    val df = input.toDS().toDF("series", "ts", "value")
    val out = StreamingQc.windowedCoverage(df, SeriesSpec(Seq("series")),
      windowDur = "1 hour", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("covout")
      .outputMode("complete").start()
    try {
      def t(min: Int) = java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusMinutes(min.toLong))
      input.addData(
        ("s1", t(5), java.lang.Double.valueOf(1.0)),
        ("s1", t(20), null),
        ("s1", t(70), java.lang.Double.valueOf(3.0)))
      q.processAllAvailable()
      val rows = spark.table("covout").orderBy("window_start").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Long]("n_obs") == 2 && rows(0).getAs[Long]("n_finite") == 1)
      assert(rows(1).getAs[Long]("n_obs") == 1 && rows(1).getAs[Long]("n_finite") == 1)
    } finally q.stop()
  }

  test("dedupAgainstKnown runs UNCHANGED as a stream-static join; batch ≡ stream") {
    // the unified-ingest exact leg under readStream: the fresh batch
    // arrives as a stream, the known corpus is the static index side —
    // Structured Streaming plans the same dedupAgainstKnown code as a
    // stream-static left join with no operator changes, which is the
    // declared streaming story for the ingest family.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val known = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"))
      .toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val out = graft.ext.Dedup.dedupAgainstKnown(
      input.toDS().toDF("doc_id", "text"), known, "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("ingestout")
      .outputMode("append").start()
    try {
      input.addData((10L, "ALPHA beta Gamma"), (11L, "novel text"))
      q.processAllAvailable()
      input.addData((12L, "delta epsilon"))
      q.processAllAvailable()
      val streamed = spark.table("ingestout")
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getBoolean(2)))
      assert(streamed.toSeq == Seq((10L, true), (11L, false), (12L, true)))
      // batch replay of the same rows is identical
      val batch = graft.ext.Dedup.dedupAgainstKnown(
        Seq((10L, "ALPHA beta Gamma"), (11L, "novel text"),
          (12L, "delta epsilon")).toDF("doc_id", "text"),
        known, "doc_id", "text")
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getBoolean(2)))
      assert(batch.toSeq == streamed.toSeq)
    } finally q.stop()
  }

  test("cmSketch merges across micro-batches: stream-accumulated cells ≡ batch sketch") {
    // THE defining property of the count-min sketch at scale: sketches
    // of disjoint shards merge by cell-wise addition. Streamed as
    // foreachBatch, each micro-batch contributes its own d×w grid and
    // the running merge (union → groupBy sum) must equal the sketch
    // of the whole corpus built in one pass — which also makes the
    // streaming twin's estimates identical to batch estimates.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val batches = Seq(
      Seq((1L, "alpha beta alpha gamma"), (2L, "beta beta delta")),
      Seq((3L, "alpha delta delta"), (4L, "gamma gamma gamma epsilon")))
    val input = MemoryStream[(Long, String)]
    val partials = scala.collection.mutable.ArrayBuffer
      .empty[Seq[(Int, Long, Long)]]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // materialized INSIDE the invocation — a micro-batch plan is
        // only valid while its batch is live
        partials += graft.ext.TextStats.cmSketch(batch, "text",
          depth = 4, width = 64).collect().toSeq
          .map(r => (r.getAs[Int]("j"), r.getAs[Long]("bucket"),
            r.getAs[Long]("cnt")))
        ()
      }
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      assert(partials.length == 2)
      // cell-wise addition of the per-shard grids
      val merged = partials.flatten
        .groupBy { case (j, b, _) => (j, b) }
        .map { case ((j, b), cs) => (j, b, cs.map(_._3).sum) }
        .toSeq.sorted
      val whole = graft.ext.TextStats.cmSketch(
        batches.flatten.toDF("doc_id", "text"), "text",
        depth = 4, width = 64)
        .collect()
        .map(r => (r.getAs[Int]("j"), r.getAs[Long]("bucket"), r.getAs[Long]("cnt")))
        .toSeq.sorted
      assert(merged == whole)
    } finally q.stop()
  }

  test("prioritySample merges across micro-batches: per-batch top-(k+1) union ≡ batch sample") {
    // priority sampling is a mergeable/streaming summary: every
    // element of the GLOBAL top-(k+1) has at most k elements above it
    // globally, hence at most k above it inside its own micro-batch —
    // so the global top-(k+1) is contained in the union of per-batch
    // top-(k+1) lists, and re-sampling that union reproduces the
    // batch sample EXACTLY, including τ and the max(w, τ) estimators.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val k = 4
    val rows = (1L to 30L).map(i => (i, (i % 7 + 1) * 10.0))
    val batches = rows.grouped(10).toSeq
    val input = MemoryStream[(Long, Double)]
    val partials = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Double)]]
    val q = input.toDS().toDF("doc_id", "w").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        partials += graft.ext.Sampling
          .prioritySample(batch, "doc_id", col("w"), k = k + 1)
          .select("doc_id", "weight").collect().toSeq
          .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("weight")))
        ()
      }
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      assert(partials.length == 3)
      val mergedIn = partials.toSeq.flatten.toDF("doc_id", "w")
      val streamed = graft.ext.Sampling
        .prioritySample(mergedIn, "doc_id", col("w"), k = k)
        .orderBy("sample_rank").collect().map(_.toSeq)
      val batchRun = graft.ext.Sampling
        .prioritySample(rows.toDF("doc_id", "w"), "doc_id", col("w"), k = k)
        .orderBy("sample_rank").collect().map(_.toSeq)
      assert(streamed.toSeq == batchRun.toSeq) // ids, priorities, τ-estimators
    } finally q.stop()
  }

  test("unified dedupIngest streams per micro-batch via foreachBatch; batch ≡ stream") {
    // the UNIFIED ingest verdict (exact + cross-corpus near +
    // intra-batch near) under a stream: the intra-batch SimHash
    // self-join cannot run as a continuous stream-stream join, so
    // the declared streaming shape is foreachBatch — per micro-batch
    // the IDENTICAL dedupIngestIndexed code runs against the
    // persisted known-side indexes (batch-exact semantics per batch,
    // the pattern every real append-only ingest deploys).
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val known = Seq((1L, base),
      (2L, (100 to 160).map(i => s"v$i").mkString(" "))).toDF("doc_id", "text")
    val knownFp = graft.ext.Dedup.simHash(known, "doc_id", "text")
    val knownIdx = known
      .select(graft.ext.Dedup.normHash(col("text")).as("text_hash")).distinct()
    val batches = Seq(
      Seq((10L, base), (11L, base + " " + base),
        (12L, (200 to 260).map(i => s"u$i").mkString(" "))),
      Seq((20L, base), (21L, (300 to 360).map(i => s"t$i").mkString(" "))))
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Seq[org.apache.spark.sql.Row])]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        got += id -> graft.ext.Dedup.dedupIngestIndexed(batch, knownFp,
          knownIdx, "doc_id", "text", maxDist = 3)
          .orderBy("doc_id").collect().toSeq
        ()
      }
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      assert(got.map(_._1).toSeq == Seq(0L, 1L))
      // each micro-batch's verdicts equal the batch run on those rows
      batches.zip(got.map(_._2)).foreach { case (rows, streamed) =>
        val batchRun = graft.ext.Dedup.dedupIngestIndexed(
          rows.toDF("doc_id", "text"), knownFp, knownIdx,
          "doc_id", "text", maxDist = 3).orderBy("doc_id").collect().toSeq
        assert(streamed == batchRun)
      }
      // the semantics themselves: exact dup flagged, doubled text is
      // near-only, fresh doc kept — in BOTH batches independently
      val b1 = got(0)._2
      assert(b1(0).getAs[Boolean]("is_known") && !b1(0).getAs[Boolean]("keep"))
      assert(!b1(1).getAs[Boolean]("is_known") &&
        b1(1).getAs[Long]("dup_of_known") == 1L &&
        b1(1).getAs[Long]("dup_of_batch") == 10L)
      assert(b1(2).getAs[Boolean]("keep"))
      val b2 = got(1)._2
      assert(b2(0).getAs[Boolean]("is_known") &&
        b2(0).getAs[Long]("dup_of_known") == 1L)
      assert(b2(1).getAs[Boolean]("keep"))
    } finally q.stop()
  }

  test("curation ingest streams per micro-batch against a frozen registry; batch ≡ stream") {
    // the END-TO-END curation verdict under a stream: gates are
    // per-doc and batch-local; families come from the frozen-family
    // registry (assignFamiliesIncremental), extended after each
    // micro-batch by a pure union of the batch's own output rows —
    // the foreachBatch shape of q_curation_e2e. On a corpus whose
    // near-dup families never bridge across batches the streamed
    // union must equal the one-shot batch composite row for row.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val enText = (1 to 12).flatMap(i =>
      Seq("the", s"w$i", "of", s"x$i", "and", s"y$i")).mkString(" ")
    val deText = (1 to 12).flatMap(i =>
      Seq("der", s"d$i", "und", s"e$i")).mkString(" ")
    // lexically disjoint from enText — SimHash is driven by the
    // highest-count words, so a "fresh" doc must not reuse enText's
    // heavy stopwords or the two fingerprints land within maxDist
    val enText2 = (100 to 160).map(i => s"v$i").mkString(" ")
    val batches = Seq(
      Seq((1L, enText), (2L, enText + " " + enText), (3L, deText)),
      // 10 near-dups batch-1's family 1 ACROSS the batch boundary —
      // it must inherit family 1 from the registry, never renumber;
      // 11 is genuinely novel and mints its own family
      Seq((10L, enText), (11L, enText2)))
    val regSchema = graft.ext.Sampling.emptyFamilyRegistry(spark).schema
    val regRows = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    def registry() = spark.createDataFrame(
      spark.sparkContext.parallelize(regRows.toSeq), regSchema)
    val got = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val out = graft.ext.TextStats.curationIngest(batch, registry(),
          "doc_id", "text", maxDist = 3).orderBy("doc_id").collect()
        got ++= out
        regRows ++= out.map(r => org.apache.spark.sql.Row(
          r.getLong(0), r.getLong(1), r.get(7)))
        ()
      }
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val streamed = got.sortBy(_.getLong(0))
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
          r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getString(6)))
      val batchRun = graft.ext.TextStats.curationPipeline(
        batches.flatten.toDF("doc_id", "text"), "doc_id", "text",
        maxDist = 3).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
          r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getString(6)))
      assert(streamed.toSeq == batchRun.toSeq)
      // the cross-batch near-dup inherited the OLD family (no renumber)
      val byId = streamed.map(t => t._1 -> t).toMap
      assert(byId(10L)._2 == 1L && !byId(10L)._5) // family 1, not keeper
      assert(byId(11L)._2 == 11L && byId(11L)._5) // novel: own family, keeper
      assert(byId(3L)._3 == false)                // de doc fails lang gate
      graft.core.Caches.unpersistAll()
    } finally q.stop()
  }

  test("BM25 index maintenance streams per micro-batch; retrieval ≡ batch at every step") {
    // the retrieval-family ingest twin: the postings index (bm25Index
    // rows — per-document, so append-only) is extended by a pure
    // union in foreachBatch; after each micro-batch, scoring against
    // the maintained index must equal one-shot bm25TopK over every
    // document seen so far.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val batches = Seq(
      Seq((1L, "apple banana apple"), (2L, "apple cherry")),
      Seq((3L, "durian elderberry fig"), (4L, "banana fig fig")))
    val q = Seq((10L, "apple banana"), (11L, "fig")).toDF("query_id", "qtext")
    val ixSchema = graft.ext.Retrieval.bm25Index(
      Seq((0L, "x")).toDF("doc_id", "text"), "doc_id", "text").schema
    val ixRows = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val input = MemoryStream[(Long, String)]
    val stream = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        ixRows ++= graft.ext.Retrieval.bm25Index(batch, "doc_id", "text")
          .collect()
        ()
      }
      .start()
    try {
      batches.foreach { b =>
        input.addData(b: _*); stream.processAllAvailable()
        seen ++= b
        val ix = spark.createDataFrame(
          spark.sparkContext.parallelize(ixRows.toSeq), ixSchema)
        val viaIx = graft.ext.Retrieval.bm25TopKIndexed(ix, q,
          "query_id", "qtext", k = 3).orderBy("query_id", "rank")
          .collect().toSeq
        val oneShot = graft.ext.Retrieval.bm25TopK(
          seen.toSeq.toDF("doc_id", "text"), "doc_id", "text", q,
          "query_id", "qtext", k = 3).orderBy("query_id", "rank")
          .collect().toSeq
        assert(viaIx == oneShot,
          s"streamed index diverged after ${seen.size} docs")
        graft.core.Caches.unpersistAll()
      }
    } finally stream.stop()
  }

  test("DSIR model maintenance streams per micro-batch; scoring ≡ batch at every step") {
    // the selection-family ingest twin: the bucket-count model
    // (dsirModel rows — mergeable by bucket-wise addition) is
    // extended by dsirModelMerge in foreachBatch, never rebuilt;
    // after each micro-batch, dsirScore of everything seen so far
    // against the MAINTAINED model must equal one-shot dsirWeights
    // over the same docs — bit for bit (the dsirScore ≡ dsirWeights
    // equivalence, now across the streamed merge path).
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.ext.Sampling
    val tgt = (1 to 20).map(i => s"t${i % 4}").mkString(" ")
    val noise = (1 to 20).map(i => s"n${i % 6}").mkString(" ")
    val batches = Seq(
      Seq((1L, "src0", tgt), (2L, "crawl", noise)),
      Seq((3L, "src0", tgt), (4L, "crawl", tgt), (5L, "crawl", "")))
    val mSchema = Sampling.dsirModel(
      Seq((0L, "src0", "x")).toDF("doc_id", "source", "text"),
      "doc_id", "text", col("source") === "src0", buckets = 64).schema
    val modelRows = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    val input = MemoryStream[(Long, String, String)]
    val stream = input.toDS().toDF("doc_id", "source", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val prev = spark.createDataFrame(
          spark.sparkContext.parallelize(modelRows.toSeq), mSchema)
        val merged = Sampling.dsirModelMerge(prev,
          Sampling.dsirModel(batch, "doc_id", "text",
            col("source") === "src0", buckets = 64)).collect()
        modelRows.clear(); modelRows ++= merged
        ()
      }
      .start()
    try {
      batches.foreach { b =>
        input.addData(b: _*); stream.processAllAvailable()
        seen ++= b
        val model = spark.createDataFrame(
          spark.sparkContext.parallelize(modelRows.toSeq), mSchema)
        val seenDf = seen.toSeq.toDF("doc_id", "source", "text")
        val viaStream = Sampling.dsirScore(seenDf, model, "doc_id",
          "text", buckets = 64).orderBy("doc_id").collect().toSeq
        val oneShot = Sampling.dsirWeights(seenDf, "doc_id", "text",
          col("source") === "src0", buckets = 64)
          .orderBy("doc_id").collect().toSeq
        assert(viaStream.map(_.toString) == oneShot.map(_.toString),
          s"streamed model diverged after ${seen.size} docs")
        graft.core.Caches.unpersistAll()
      }
    } finally stream.stop()
  }

  test("streaming exact dedup keeps first arrival, drops repeats across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = input.toDS().toDF("doc_id", "ts", "text")
    val out = StreamingQc.dedupExactStream(df, "text", "ts", watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("dedupout")
      .outputMode("append").start()
    try {
      def t(min: Int) = java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusMinutes(min.toLong))
      input.addData((1L, t(0), "Hello World"), (2L, t(1), "  hello world "),
        (3L, t(2), "other text"))
      q.processAllAvailable()
      // repeat in a LATER batch — state must remember the hash
      input.addData((4L, t(10), "HELLO WORLD"), (5L, t(11), "fresh"))
      q.processAllAvailable()
      val ids = spark.table("dedupout").select("doc_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 3L, 5L), s"got ${ids.toSeq}")
    } finally q.stop()
  }

  test("streaming debounce equals batch on a replayed log, bursts span batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // key 1: burst 0,30,55,200s (chained: 30 within 60s of 0, 55
    // within 60s of 30 even though 30 was DROPPED, 200 survives);
    // key 2: equal-spaced keepers. The 55s row lands in batch 2 —
    // the anchor must persist across the boundary.
    val log = Seq(
      (1L, 0L, 1L), (1L, 30_000_000L, 2L), (2L, 0L, 3L),
      (1L, 55_000_000L, 4L), (1L, 200_000_000L, 5L), (2L, 90_000_000L, 6L))
    val input = MemoryStream[StreamingQc.DebounceRow]
    val q = StreamingQc.debounceStream(input.toDS(), toleranceUs = 60_000_000L)
      .writeStream.format("memory").queryName("debout")
      .outputMode("append").start()
    try {
      log.map(r => StreamingQc.DebounceRow(r._1, r._2, r._3))
        .grouped(3).foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("debout")
        .select("key", "tsUs", "tiebreak", "kept")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
        .sortBy(t => (t._1, t._2)).toSeq
      val batch = Sessionize.debounce(
          log.toDF("key", "tsUs", "tiebreak"), Seq("key"), "tsUs",
          "tiebreak", toleranceUs = 60_000_000L)
        .select("key", "tsUs", "kept")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(streamed == batch, s"stream=$streamed batch=$batch")
      assert(streamed.map(_._3) == Seq(true, false, false, true, true, true))
    } finally q.stop()
  }

  test("streaming near-dup candidates surface a planted pair across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = input.toDS().toDF("doc_id", "ts", "text")
      .withWatermark("ts", "1 hour")
    val out = StreamingQc.nearDupCandidatesStream(df, "doc_id", "text", "ts")
    val q = out.writeStream.format("memory").queryName("nddout")
      .outputMode("append").start()
    try {
      def t(min: Int) = java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusMinutes(min.toLong))
      val base = "the quick brown fox jumps over the lazy dog near the river bank"
      input.addData((1L, t(0), base),
        (3L, t(1), "completely unrelated text about spark physical plans"))
      q.processAllAvailable()
      // the near-dup arrives a BATCH LATER — bucket state must remember doc 1
      input.addData((2L, t(10), base + " today"))
      q.processAllAvailable()
      val pairs = spark.table("nddout").select("idA", "idB").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 2L)), s"planted pair missing: $pairs")
      assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
        s"unrelated doc must not pair: $pairs")
    } finally q.stop()
  }

  test("streaming near-dup bucket cap bounds state: capped-out docs never pair") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = input.toDS().toDF("doc_id", "ts", "text")
      .withWatermark("ts", "1 hour")
    val out = StreamingQc.nearDupCandidatesStream(df, "doc_id", "text", "ts",
      maxBucketSize = 1)
    val q = out.writeStream.format("memory").queryName("ndcap")
      .outputMode("append").start()
    try {
      def t(min: Int) = java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusMinutes(min.toLong))
      val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
      input.addData((1L, t(0), base), (2L, t(1), base), (3L, t(2), base))
      q.processAllAvailable()
      val pairs = spark.table("ndcap").select("idA", "idB").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // cap=1: only doc 1 is retained per bucket, so 2 and 3 each pair
      // with 1 but never with each other
      assert(pairs == Set((1L, 2L), (1L, 3L)), s"got $pairs")
    } finally q.stop()
  }

  test("streaming near-dup TTL anchors to the running max event time, not the batch max") {
    // Regression for the r5 ADVICE finding: a later batch carrying an
    // OLDER (still-valid) event for a bucket must not pull the bucket's
    // expiry earlier than stateTtl past the newest event already in
    // state. Timeline (watermark delay 10 min, TTL 1 h):
    //   batch 1: doc 1 at 1:00  -> expiry anchored at 2:00
    //   batch 2: doc 2 at 0:55 (same bucket, older, above watermark)
    //            buggy anchor: 0:55 + 1h = 1:55; fixed: stays 2:00
    //   batches 3-4: unrelated docs push the watermark to 1:57-1:58 —
    //            between the buggy and correct expiries; batch 4 gives
    //            the bucket a no-data batch in which a buggy timeout
    //            would fire and drop the state
    //   batch 5: doc 4 (same bucket, 1:59) must still pair with BOTH
    //            1 and 2 — state survived only if the anchor held
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = input.toDS().toDF("doc_id", "ts", "text")
      .withWatermark("ts", "10 minutes")
    val out = StreamingQc.nearDupCandidatesStream(df, "doc_id", "text", "ts",
      stateTtl = "1 hour")
    val q = out.writeStream.format("memory").queryName("ndttl")
      .outputMode("append").start()
    try {
      def t(min: Int) = java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusMinutes(min.toLong))
      val base = "the quick brown fox jumps over the lazy dog near the river bank"
      input.addData((1L, t(60), base))
      q.processAllAvailable()
      input.addData((2L, t(55), base)) // older but above watermark (0:50)
      q.processAllAvailable()
      input.addData((3L, t(127), "completely unrelated text about spark plans"))
      q.processAllAvailable() // watermark -> 1:57
      input.addData((5L, t(128), "another unrelated filler document entirely"))
      q.processAllAvailable() // no-data batch for the bucket at wm 1:57
      input.addData((4L, t(119), base))
      q.processAllAvailable()
      val pairs = spark.table("ndttl").select("idA", "idB").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 2L)), s"same-bucket pair missing: $pairs")
      assert(pairs.contains((1L, 4L)) && pairs.contains((2L, 4L)),
        s"state expired early — TTL anchored to batch max, not running max: $pairs")
    } finally q.stop()
  }

  test("stateless flags work unchanged on a stream") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, java.sql.Timestamp, java.lang.Double)]
    val df = input.toDS().toDF("series", "ts", "value")
    val out = StreamingQc.statelessFlags(df, SeriesSpec(Seq("series")), 0.0, 100.0)
    val q = out.writeStream.format("memory").queryName("flagsout")
      .outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      input.addData(("s1", t0, java.lang.Double.valueOf(150.0)),
        ("s1", t0, java.lang.Double.valueOf(-9.0)),
        ("s1", t0, null))
      q.processAllAvailable()
      val rows = spark.table("flagsout").collect()
      assert(rows.count(_.getAs[Boolean]("flag_range")) == 2) // 150 and -9
      assert(rows.count(_.getAs[Boolean]("flag_sentinel")) == 1)
      assert(rows.count(_.getAs[Boolean]("flag_missing")) == 1)
    } finally q.stop()
  }

  test("streaming sentem bands match the batch engine on finalized points") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.sentem.{RunParams, SentemConfig, SentemQc}
    // small-window config so a short stream finalizes most points
    val cfg = SentemConfig(Seq(
      RunParams(8, 2.0, true, 0.3, 0.2), RunParams(8, 2.0, true, 0.3, 0.2),
      RunParams(4, 1.6, true, 0.05, 0.05), RunParams(5, 1.3, true, 0.05, 0.05),
      RunParams(5, 1.3, true, 0.05, 0.05)), uncertaintyCon = Some(0.1))
    val rng = new scala.util.Random(3)
    val vals = (0 until 60).map { i =>
      if (i == 25) 50.0                       // spike -> must flag
      else if (i == 40) Double.NaN            // missing
      else 7.0 + 0.5 * math.sin(i / 5.0) + 0.05 * rng.nextDouble()
    }
    def ev(i: Int) = SeriesEvent("s1", us(15L * i),
      if (vals(i).isNaN) null else java.lang.Double.valueOf(vals(i)))

    // batch ground truth (code 410 = pH rules)
    val batchDf = (0 until 60).map(i =>
      ("s1", new java.sql.Timestamp(us(15L * i) / 1000),
        if (vals(i).isNaN) null else java.lang.Double.valueOf(vals(i))))
      .toDF("series", "ts", "value")
    val spec = SeriesSpec(Seq("series"))
    val batch = SentemQc(batchDf, spec, 410, cfg, isNitrate = false)
      .select(unix_micros(col("ts")).as("tsUs"), col("flag_global"),
        col("flag_reason"), col("qcband_top"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap

    val input = MemoryStream[SeriesEvent]
    val q = StreamingQc.sentemFlags(input.toDS(), 410, cfg, isNitrate = false)
      .writeStream.format("memory").queryName("sentemout")
      .outputMode("append").start()
    try {
      input.addData((0 until 30).map(ev): _*)
      q.processAllAvailable()
      val afterB1 = spark.table("sentemout").count()
      assert(afterB1 > 0 && afterB1 < 30) // tail awaits lookahead
      input.addData((30 until 60).map(ev): _*)
      q.processAllAvailable()
      val rows = spark.table("sentemout").orderBy("tsUs").collect()
      // every emitted point exists once and matches the batch engine
      assert(rows.length == rows.map(_.getLong(1)).distinct.length)
      assert(rows.length >= 56) // all but the final lookahead tail
      rows.foreach { r =>
        val (bFlag, bReason, bTop) = batch(r.getLong(1))
        assert(r.getAs[Int]("flagGlobal") == bFlag, s"flag at ${r.getLong(1)}")
        assert(r.getAs[String]("flagReason") == bReason, s"reason at ${r.getLong(1)}")
        val sTop = Option(r.get(r.fieldIndex("bandTop"))).map(_.asInstanceOf[Double])
        (sTop, bTop) match {
          case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9)
          case (a, b) => assert(a == b, s"band presence at ${r.getLong(1)}")
        }
      }
      // the spike was flagged somewhere
      assert(rows.exists(_.getAs[Int]("flagGlobal") == 200))
    } finally q.stop()
  }

  test("streaming sentem drops events behind the finalized horizon, sorts ahead of it") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.sentem.{RunParams, SentemConfig}
    val cfg = SentemConfig(Seq(
      RunParams(8, 2.0, true, 0.3, 0.2), RunParams(8, 2.0, true, 0.3, 0.2),
      RunParams(4, 1.6, true, 0.05, 0.05), RunParams(5, 1.3, true, 0.05, 0.05),
      RunParams(5, 1.3, true, 0.05, 0.05)), uncertaintyCon = Some(0.1))
    val input = MemoryStream[SeriesEvent]
    val q = StreamingQc.sentemFlags(input.toDS(), 410, cfg, isNitrate = false)
      .writeStream.format("memory").queryName("sentemlate")
      .outputMode("append").start()
    try {
      // batch 1: t = 0..19 (minutes 0,15,...), finalizes t <= 16
      input.addData((0 until 20).map(i =>
        SeriesEvent("s1", us(15L * i), java.lang.Double.valueOf(7.0))): _*)
      q.processAllAvailable()
      val emitted1 = spark.table("sentemlate").count()
      assert(emitted1 == 17) // 20 - maxFollow(3)
      // batch 2: one event BEHIND the horizon (dropped), one in the
      // unfinalized window (merge-sorted, evaluated in position), plus
      // fresh tail data
      input.addData(
        SeriesEvent("s1", us(15L * 5 + 1), java.lang.Double.valueOf(99.0)), // late, dropped
        SeriesEvent("s1", us(15L * 18 + 1), java.lang.Double.valueOf(7.0)), // in-window
        SeriesEvent("s1", us(15L * 20), java.lang.Double.valueOf(7.0)),
        SeriesEvent("s1", us(15L * 21), java.lang.Double.valueOf(7.0)),
        SeriesEvent("s1", us(15L * 22), java.lang.Double.valueOf(7.0)))
      q.processAllAvailable()
      val rows = spark.table("sentemlate").orderBy("tsUs").collect()
      val times = rows.map(_.getAs[Long]("tsUs")).toSeq
      assert(times == times.distinct, "no duplicate emissions")
      assert(!times.contains(us(15L * 5 + 1)), "late event not re-emitted")
      // the in-window insert is evaluated once its own lookahead fills
      assert(times.contains(us(15L * 18 + 1)))
    } finally q.stop()
  }

  test("streaming hopping counts equal the batch operator on a replayed log") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // seconds-scale log across two types, replayed in two batches
    val log = for (i <- 0 until 40)
      yield (i.toLong, (i * i * 731L) % 9500L, if (i % 3 == 0) "a" else "b")
    def t(ms: Long) = new java.sql.Timestamp(ms)
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = input.toDF().toDF("id", "ts", "t")
    val q = StreamingQc.hoppingCountsStream(df, "ts", "2 seconds",
        "1 second", Seq("t"), watermark = "0 seconds")
      .writeStream.format("memory").queryName("hopeq")
      .outputMode("complete").start()
    try {
      log.grouped(20).foreach { b =>
        input.addData(b.map { case (id, ms, ty) => (id, t(ms), ty) }: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("hopeq")
        .as[(Long, Long, String, Long)].collect.toSeq.sorted
      val batch = graft.ext.Sessionize.hoppingCounts(
        log.toDF("id", "ms", "t")
          .select(col("t"), timestamp_micros(col("ms") * 1000L).as("ts")),
        "ts", "2 seconds", "1 second", Seq("t"))
        .as[(Long, Long, String, Long)].collect.toSeq.sorted
      assert(streamed.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("streaming keep-latest state equals batch compactLatest after replay") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val log = for (i <- 0 until 60)
      yield StreamingQc.UpsertRow((i % 7).toLong, (i * 37L) % 50L,
        i.toLong, i * 1.5)
    val input = MemoryStream[StreamingQc.UpsertRow]
    val q = StreamingQc.latestStateStream(input.toDS())
      .writeStream.format("memory").queryName("lateststate")
      .outputMode("update").start()
    try {
      log.grouped(20).foreach { b =>
        input.addData(b: _*); q.processAllAvailable()
      }
      // every emission is a comparator-monotone candidate, so the max
      // over emissions per key == the final state == batch compaction
      val streamed = Sessionize.compactLatest(spark.table("lateststate"),
          Seq("userId"), "tsUs", "eventId")
        .as[StreamingQc.UpsertRow].collect.toSeq.sortBy(_.userId)
      val batch = Sessionize.compactLatest(
          log.toDF("userId", "tsUs", "eventId", "value"),
          Seq("userId"), "tsUs", "eventId")
        .as[StreamingQc.UpsertRow].collect.toSeq.sortBy(_.userId)
      assert(streamed == batch && streamed.size == 7)
    } finally q.stop()
  }

  test("streaming grouped OLS equals the batch fit after replay") {
    // groupedLinearFit is ONE map-side-combined aggregation over exact
    // integer moments, so the identical operator runs on a stream in
    // complete mode — the mergeable-moments shape is what makes the
    // fit incremental for free (decimal sums merge across batches).
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val rows = (1 to 120).map { i =>
      val g = if (i % 3 == 0) "a" else "b"
      val x = rng.nextInt(2000) / 100.0
      val y = math.round((1.75 * x + 4.0 + rng.nextInt(300) / 100.0) * 100) / 100.0
      (g, x, y)
    }
    val input = MemoryStream[(String, Double, Double)]
    val q = graft.operators.Diagnostics.groupedLinearFit(
        input.toDF().toDF("g", "x", "y"), Seq("g"), "x", "y")
      .writeStream.format("memory").queryName("olsout")
      .outputMode("complete").start()
    try {
      rows.grouped(40).foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("olsout")
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
      val batch = graft.operators.Diagnostics.groupedLinearFit(
          rows.toDF("g", "x", "y"), Seq("g"), "x", "y")
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
      assert(streamed == batch && streamed.size == 2)
    } finally q.stop()
  }

  test("streaming local2 twin is bit-identical to the batch WRTDS kernel on replay") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // two series, daily cadence, one missing point each — deterministic
    // values (no RNG) so the fixture is stable across runs
    val vals1 = (0 until 60).map(i =>
      if (i == 13) Double.NaN
      else 5.0 + 2.0 * math.sin(i / 4.0) + 0.1 * ((i * 37) % 10))
    val vals2 = (0 until 45).map(i =>
      if (i == 7) Double.NaN else 8.0 + 1.5 * math.cos(i / 3.0))
    def tsOf(i: Int): Long = us(1440L * i)
    def boxed(v: Double): java.lang.Double =
      if (v.isNaN) null else java.lang.Double.valueOf(v)
    val batchRows =
      vals1.zipWithIndex.map { case (v, i) =>
        ("s1", new java.sql.Timestamp(tsOf(i) / 1000), boxed(v)) } ++
      vals2.zipWithIndex.map { case (v, i) =>
        ("s2", new java.sql.Timestamp(tsOf(i) / 1000), boxed(v)) }
    val batch = graft.wrtds.Wrtds.local2(
        batchRows.toDF("series", "ts", "value"), SeriesSpec(Seq("series")),
        htDays = 3.0, supportDays = 10.0, minp = 5)
      .select(col("series"), unix_micros(col("ts")).as("tsUs"),
        col("value"), col("l2_yhat"), col("l2_resid"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))))
      .toMap
    val input = MemoryStream[SeriesEvent]
    val q = StreamingQc.localFitStream(input.toDS(),
        htDays = 3.0, supportDays = 10.0, minp = 5)
      .writeStream.format("memory").queryName("localfitout")
      .outputMode("append").start()
    try {
      // batch 1: partial replay — only points whose +10d support has
      // closed may emit
      input.addData(
        (0 until 20).map(i => SeriesEvent("s1", tsOf(i), boxed(vals1(i)))) ++
        (0 until 15).map(i => SeriesEvent("s2", tsOf(i), boxed(vals2(i)))): _*)
      q.processAllAvailable()
      val after1 = spark.table("localfitout").count()
      // s1: maxDay 19 → finalize day < 9 (9 pts); s2: maxDay 14 → 4 pts
      assert(after1 == 13, s"after batch 1: $after1")
      input.addData(
        (20 until 60).map(i => SeriesEvent("s1", tsOf(i), boxed(vals1(i)))) ++
        (15 until 45).map(i => SeriesEvent("s2", tsOf(i), boxed(vals2(i)))): _*)
      q.processAllAvailable()
      // a late event behind the finalized horizon must be dropped, not
      // re-emitted or re-fitted
      input.addData(SeriesEvent("s1", tsOf(2) + 1, java.lang.Double.valueOf(99.0)))
      q.processAllAvailable()
      val rows = spark.table("localfitout").collect()
      // s1: 59 - d > 10 → 49 pts; s2: 44 - d > 10 → 34 pts
      assert(rows.length == 83, s"emitted ${rows.length}")
      assert(rows.map(r => (r.getString(0), r.getLong(1))).distinct.length == 83)
      rows.foreach { r =>
        val k = (r.getString(0), r.getLong(1))
        val (bv, by, brs) = batch(k)
        assert(Option(r.get(2)) == bv, s"value at $k")
        // bit-identical fits: compare the raw doubles, not a tolerance
        assert(Option(r.get(3)) == by, s"l2_yhat at $k: ${r.get(3)} vs $by")
        assert(Option(r.get(4)) == brs, s"l2_resid at $k")
      }
      // the missing-value points emit with NULL value/resid but a fit
      val miss = rows.find(r => r.getString(0) == "s1" && r.getLong(1) == tsOf(13)).get
      assert(miss.isNullAt(2) && !miss.isNullAt(3) && miss.isNullAt(4))
    } finally q.stop()
  }

  test("streaming local2: a support-sized gap keeps horizon and origin frozen") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // a gap longer than the support window evicts EVERY finalized
    // lookback point (done drops to 0) — the horizon and the series
    // origin must survive in state, or a late event re-emits and every
    // post-gap fit is computed against a shifted day-0 (round-14
    // review regression pin)
    def tsOf(i: Int): Long = us(1440L * i)
    val days = (0 to 5) ++ (30 to 45)
    def v(i: Int): Double = 4.0 + math.sin(i / 2.0)
    val batch = graft.wrtds.Wrtds.local2(
        days.map(i => ("s1", new java.sql.Timestamp(tsOf(i) / 1000),
          java.lang.Double.valueOf(v(i)))).toDF("series", "ts", "value"),
        SeriesSpec(Seq("series")), htDays = 3.0, supportDays = 10.0, minp = 2)
      .select(unix_micros(col("ts")).as("tsUs"), col("l2_yhat"), col("l2_resid"))
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)))))
      .toMap
    val input = MemoryStream[SeriesEvent]
    val q = StreamingQc.localFitStream(input.toDS(),
        htDays = 3.0, supportDays = 10.0, minp = 2)
      .writeStream.format("memory").queryName("localfitgap")
      .outputMode("append").start()
    try {
      // batch 1: pre-gap days + the first post-gap stretch — finalizes
      // days 0..5 (maxDay 34 − d > 10) and evicts all of them (day 30's
      // support reaches only to day 20)
      input.addData(((0 to 5) ++ (30 to 34)).map(i =>
        SeriesEvent("s1", tsOf(i), java.lang.Double.valueOf(v(i)))): _*)
      q.processAllAvailable()
      assert(spark.table("localfitgap").count() == 6)
      // batch 2: a late event BEHIND the frozen horizon must be
      // dropped (pre-fix it re-entered and re-emitted day 3), plus the
      // tail that finalizes days 30..34
      input.addData(
        SeriesEvent("s1", tsOf(3) + 1, java.lang.Double.valueOf(99.0)) +:
        (35 to 45).map(i =>
          SeriesEvent("s1", tsOf(i), java.lang.Double.valueOf(v(i)))): _*)
      q.processAllAvailable()
      val rows = spark.table("localfitgap").collect()
      assert(rows.length == 11, s"emitted ${rows.length}") // 6 + days 30..34
      assert(rows.map(_.getLong(1)).distinct.length == 11)
      // post-gap fits must be bit-identical to batch — a reset origin
      // (day 0 = day 30) would shift every micro-rounded day term
      rows.foreach { r =>
        val (by, brs) = batch(r.getLong(1))
        assert(Option(r.get(3)) == by, s"l2_yhat at ${r.getLong(1)}")
        assert(Option(r.get(4)) == brs, s"l2_resid at ${r.getLong(1)}")
      }
    } finally q.stop()
  }

  test("streaming local2: eviction keeps the lookback an admissible late event's fit needs") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // Round-14 close-out review regression: eviction used to anchor at
    // the OLDEST UNFINALIZED day, so a late event admitted just above
    // the horizon (day 19.5 here, horizon 19, oldest unfinalized 20)
    // could have finalized neighbors its own support window still
    // reaches (day 9.5: |19.5 − 9.5| = 10 = supportDays) already
    // evicted — its fit then silently omitted them vs a batch replay.
    // Anchoring at the horizon retains exactly what any admissible
    // late event can reach.
    def tsOfM(minutes: Long): Long = us(minutes)
    def v(m: Long): Double = 4.0 + math.sin(m / 2000.0)
    val mb1 = ((0 to 30).map(i => 1440L * i) :+ 13680L).sorted // days 0..30 + day 9.5
    val late = 28080L                                          // day 19.5
    val mb3 = (31 to 45).map(i => 1440L * i)
    val all = (mb1 :+ late) ++ mb3
    val batchFull = graft.wrtds.Wrtds.local2(
        all.map(m => ("s1", new java.sql.Timestamp(tsOfM(m) / 1000),
          java.lang.Double.valueOf(v(m)))).toDF("series", "ts", "value"),
        SeriesSpec(Seq("series")), htDays = 3.0, supportDays = 10.0, minp = 2)
      .select(unix_micros(col("ts")).as("tsUs"), col("l2_yhat"), col("l2_resid"))
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)))))
      .toMap
    val input = MemoryStream[SeriesEvent]
    val q = StreamingQc.localFitStream(input.toDS(),
        htDays = 3.0, supportDays = 10.0, minp = 2)
      .writeStream.format("memory").queryName("localfitlate")
      .outputMode("append").start()
    try {
      input.addData(mb1.map(m =>
        SeriesEvent("s1", tsOfM(m), java.lang.Double.valueOf(v(m)))): _*)
      q.processAllAvailable()
      // maxDay 30 finalizes day < 20: days 0..19 plus 9.5 = 21 rows
      assert(spark.table("localfitlate").count() == 21)
      input.addData(SeriesEvent("s1", tsOfM(late), java.lang.Double.valueOf(v(late))))
      q.processAllAvailable()
      // 19.5 itself finalizes (30 − 19.5 > 10)
      assert(spark.table("localfitlate").count() == 22)
      input.addData(mb3.map(m =>
        SeriesEvent("s1", tsOfM(m), java.lang.Double.valueOf(v(m)))): _*)
      q.processAllAvailable()
      val rows = spark.table("localfitlate").collect()
      assert(rows.length == 37, s"emitted ${rows.length}") // + days 20..34
      // every row finalized at-or-after the late event's arrival sees
      // the same window a full-series batch replay computes — bit-equal
      val lateOn = rows.filter(_.getLong(1) >= tsOfM(late))
      assert(lateOn.length == 16)
      lateOn.foreach { r =>
        val (by, brs) = batchFull(r.getLong(1))
        assert(Option(r.get(3)) == by,
          s"l2_yhat at ${r.getLong(1)}: ${r.get(3)} vs $by")
        assert(Option(r.get(4)) == brs, s"l2_resid at ${r.getLong(1)}")
      }
    } finally q.stop()
  }

  test("streaming local2: a genuine NaN value raises like the batch kernel") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // batch local2 raises on a NaN value (FastRound's ANSI cast on the
    // NaN micro term); the stream must not silently alias it to the
    // missing-value marker and emit plausible numbers where batch errors
    val input = MemoryStream[SeriesEvent]
    val q = StreamingQc.localFitStream(input.toDS(),
        htDays = 3.0, supportDays = 10.0, minp = 2)
      .writeStream.format("memory").queryName("localfitnan")
      .outputMode("append").start()
    try {
      input.addData(
        SeriesEvent("s1", us(0), java.lang.Double.valueOf(1.0)),
        SeriesEvent("s1", us(1440), java.lang.Double.valueOf(Double.NaN)))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(c => c.isInstanceOf[ArithmeticException] &&
        c.getMessage.contains("NaN value")), s"unexpected failure: $e")
    } finally q.stop()
  }
}
