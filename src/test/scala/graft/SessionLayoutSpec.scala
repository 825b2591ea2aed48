package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Layout, Sessionize, TextStats}

/** Semantics + plan-shape coverage for the behavioral (sessionize /
  * funnel), layout (bucketed join) and dedup-decision (representatives,
  * containment, bigrams) operators added in round 6.
  */
class SessionLayoutSpec extends SparkTestBase {

  import spark.implicits._

  private def shuffleCount(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }.size

  /** AQE's plan wrapper hides exchanges from collect — count on the
    * static plan.
    */
  private def withStaticPlans[A](f: => A): A = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def ev(rows: (Long, Long, String)*): DataFrame =
    rows.toDF("user_id", "us", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_type"))

  // ---- sessionize ----

  test("sessionize splits on gap strictly greater than gapUs") {
    // gaps: 10 (stay), 100 (exactly gap -> stay), 101 (open)
    val d = ev((1L, 0L, "a"), (1L, 10L, "a"), (1L, 110L, "a"),
      (1L, 211L, "a"))
    val out = Sessionize.sessionize(d, "user_id", "ts", gapUs = 100L)
      .orderBy("session_idx")
      .select("session_idx", "start_us", "end_us", "n_events", "duration_us")
      .as[(Long, Long, Long, Long, Long)].collect.toSeq
    assert(out == Seq((0L, 0L, 110L, 3L, 110L), (1L, 211L, 211L, 1L, 0L)))
  }

  test("sessionize: duplicate timestamps never open a session; users independent") {
    val d = ev((1L, 0L, "a"), (1L, 0L, "b"), (1L, 50L, "a"),
      (2L, 1000L, "a"))
    val out = Sessionize.sessionize(d, "user_id", "ts", gapUs = 10L)
      .orderBy("user_id", "session_idx")
      .select("user_id", "session_idx", "n_events")
      .as[(Long, Long, Long)].collect.toSeq
    assert(out == Seq((1L, 0L, 2L), (1L, 1L, 1L), (2L, 0L, 1L)))
  }

  test("sessionize plans exactly one exchange (window + grouping co-partitioned)") {
    val d = ev((1L, 0L, "a"), (2L, 5L, "b"))
    withStaticPlans {
      assert(shuffleCount(Sessionize.sessionize(d, "user_id", "ts", 100L)) == 1)
    }
  }

  // ---- funnel ----

  test("funnel requires strictly-ordered steps and propagates nulls") {
    val d = ev(
      // u1: full traversal
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // u2: click BEFORE view -> click stage unreached after t0=50
      (2L, 40L, "click"), (2L, 50L, "view"), (2L, 60L, "purchase"),
      // u3: click at the SAME us as view -> not strictly after
      (3L, 70L, "view"), (3L, 70L, "click"),
      // u4: never views
      (4L, 80L, "purchase"))
    val out = Sessionize.funnel(d, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .select("user_id", "t_view_us", "t_click_us", "t_purchase_us",
        "stages_completed")
      .as[(Long, Option[Long], Option[Long], Option[Long], Int)]
      .collect.toSeq
    assert(out == Seq(
      (1L, Some(10L), Some(20L), Some(30L), 3),
      (2L, Some(50L), None, None, 1),
      (3L, Some(70L), None, None, 1),
      (4L, None, None, None, 0)))
  }

  test("funnel keeps the earliest valid traversal, not the first match chain") {
    // view@10, click@15, view@20, click@25: t0=10, first click after -> 15
    val d = ev((1L, 10L, "view"), (1L, 15L, "click"), (1L, 20L, "view"),
      (1L, 25L, "click"))
    val out = Sessionize.funnel(d, "user_id", "ts", "event_type",
      Seq("view", "click"))
      .select("t_view_us", "t_click_us")
      .as[(Option[Long], Option[Long])].collect.toSeq
    assert(out == Seq((Some(10L), Some(15L))))
  }

  test("funnel plans exactly one exchange for any number of steps") {
    val d = ev((1L, 0L, "view"), (2L, 5L, "click"))
    withStaticPlans {
      val f = Sessionize.funnel(d, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      assert(shuffleCount(f) == 1)
    }
  }

  // ---- bucketed layout join ----

  test("bucketedOrdersJoin: only the rollup exchanges; result matches plain join") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val dir = "/root/testdata/sf0.001"
      val out = Layout.bucketedOrdersJoin(spark, dir, buckets = 4,
        prefix = "graft_test_bkt")
      // the join of the two bucketed scans moves nothing; the single
      // exchange in the plan is the (5-row) priority rollup's
      assert(shuffleCount(out) == 1,
        s"expected 1 exchange:\n${out.queryExecution.executedPlan}")
      val expected = Layout.bucketedJoinAgg(
        graft.sources.Tables.orders(spark, dir),
        graft.sources.Tables.lineitem(spark, dir))
        .orderBy("o_orderpriority").collect.toSeq
      assert(out.orderBy("o_orderpriority").collect.toSeq == expected)
      // idempotent across sessions: a second materialization over the
      // already-existing warehouse dirs must succeed and agree (the
      // first `out` plan is invalidated by the rewrite — by design,
      // like any overwritten table)
      val again = Layout.bucketedOrdersJoin(spark, dir, buckets = 4,
        prefix = "graft_test_bkt")
      assert(again.orderBy("o_orderpriority").collect.toSeq == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_test_bkt_orders")
      spark.sql("DROP TABLE IF EXISTS graft_test_bkt_lineitem")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  // ---- representative selection ----

  test("selectRepresentatives keeps highest quality, ties to smallest id") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("doc_id", "cluster_id")
    val docs = Seq((1L, 5L), (2L, 7L), (3L, 7L), (9L, 1L))
      .toDF("doc_id", "n_chars")
    val out = Dedup.selectRepresentatives(clusters, docs, "doc_id",
      col("n_chars"))
      .orderBy("doc_id")
      .select("doc_id", "cluster_id", "n_members", "keep")
      .as[(Long, Long, Long, Boolean)].collect.toSeq
    // cluster 1: docs 2 and 3 tie on quality 7 -> 2 kept; singleton 9 kept
    assert(out == Seq((1L, 1L, 3L, false), (2L, 1L, 3L, true),
      (3L, 1L, 3L, false), (9L, 9L, 1L, true)))
  }

  // ---- containment ----

  test("containment flags a short doc embedded in a long one where jaccard misses") {
    val short = "alpha beta gamma delta"
    val long0 = s"$short " +
      (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, short), (2L, long0)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text",
      k = 2, threshold = 0.9, maxDf = 20)
      .select("id_a", "id_b", "containment")
      .as[(Long, Long, Double)].collect.toSeq
    graft.core.Caches.unpersistAll()
    // all 3 shingles of the short doc appear in the long one
    assert(cont == Seq((1L, 2L, 1.0)))
    val jac = Dedup.ngramJaccardCapped(docs, "doc_id", "text",
      k = 2, threshold = 0.9, maxDf = 20).count()
    graft.core.Caches.unpersistAll()
    assert(jac == 0, "symmetric jaccard should NOT fire on short-in-long")
  }

  // ---- bigram frequencies ----

  test("bigramFrequencies counts occurrences and doc frequency, top-k ordered") {
    val docs = Seq(
      (1L, "a b a b"),      // "a b" x2, "b a" x1
      (2L, "a b"),          // "a b" x1
      (3L, "solo"),         // no bigrams
      (4L, "")).toDF("doc_id", "text")
    val out = TextStats.bigramFrequencies(docs, "doc_id", "text", k = 10)
      .as[(String, Long, Long)].collect.toSeq
    assert(out == Seq(("a b", 3L, 2L), ("b a", 1L, 1L)))
  }
}
