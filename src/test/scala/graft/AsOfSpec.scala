package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.functions._

import graft.ext.Sessionize
import graft.operators.{AsOf, IntervalJoin}

/** Semantics + plan shape for the as-of join (union-merge), the
  * bucket-decomposed interval join, and changelog compaction.
  */
class AsOfSpec extends SparkTestBase {

  import spark.implicits._

  private def withStaticPlans[A](f: => A): A = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def shuffleCount(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }.size

  // ---- as-of join ----

  private def lr = (
    Seq((1L, 10L, "p10"), (1L, 5L, "p5"), (1L, 2L, "p2"), (2L, 7L, "q7"))
      .toDF("k", "lt", "lv"),
    Seq((1L, 3L, 30.0), (1L, 5L, 50.0), (1L, 9L, 90.0), (3L, 1L, 10.0))
      .toDF("k", "rt", "rv"))

  test("asofJoin picks the latest right row at-or-before each left row") {
    val (l, r) = lr
    val out = AsOf.asofJoin(l, r, "k", "lt", "rt", Seq("rv"))
      .orderBy("k", "lt")
      .select("k", "lt", "lv", "asof_rt", "asof_rv")
      .as[(Long, Long, String, Option[Long], Option[Double])].collect.toSeq
    assert(out == Seq(
      // lt=2: before any right row -> null
      (1L, 2L, "p2", None, None),
      // lt=5: right row AT 5 matches (inclusive)
      (1L, 5L, "p5", Some(5L), Some(50.0)),
      // lt=10: latest of {3,5,9} -> 9
      (1L, 10L, "p10", Some(9L), Some(90.0)),
      // key 2 has no right rows at all
      (2L, 7L, "q7", None, None)))
  }

  test("asofJoin plans one exchange and no join node") {
    withStaticPlans {
      val (l, r) = lr
      val out = AsOf.asofJoin(l, r, "k", "lt", "rt", Seq("rv"))
      assert(shuffleCount(out) == 1,
        s"expected 1 exchange:\n${out.queryExecution.executedPlan}")
      val joins = out.queryExecution.executedPlan.collect {
        case j: BaseJoinExec => j
      }
      assert(joins.isEmpty, "union-merge as-of must not plan a join")
    }
  }

  test("asofJoin against the join+argmax reference on a random fixture") {
    val l = (0 until 300)
      .map(i => ((i % 7).toLong, (i * 37 % 101).toLong, i.toLong))
      .toDF("k", "lt", "lid").distinct()
    val r = (0 until 150)
      .map(i => ((i % 9).toLong, (i * 53 % 97).toLong, i * 1.5))
      .toDF("k", "rt", "rv")
      .groupBy("k", "rt").agg(max("rv").as("rv"))
    val fast = AsOf.asofJoin(l, r, "k", "lt", "rt", Seq("rv"))
      .select("k", "lt", "lid", "asof_rt", "asof_rv")
    val ref = l.as("l")
      .join(r.as("r"), col("l.k") === col("r.k") && col("l.lt") >= col("r.rt"),
        "left")
      .groupBy(col("l.k").as("k"), col("l.lt").as("lt"), col("l.lid").as("lid"))
      .agg(max(struct(col("r.rt"), col("r.rv"))).as("m"))
      .select(col("k"), col("lt"), col("lid"),
        col("m.rt").as("asof_rt"), col("m.rv").as("asof_rv"))
    val a = fast.orderBy("k", "lt", "lid").collect.toSeq
    val b = ref.orderBy("k", "lt", "lid").collect.toSeq
    assert(a == b)
  }

  test("asofJoin tolerance discards matches staler than the bound") {
    val (l, r) = lr
    val out = AsOf.asofJoin(l, r, "k", "lt", "rt", Seq("rv"),
      toleranceUs = Some(1L))
      .orderBy("k", "lt")
      .select("k", "lt", "asof_rt", "asof_rv")
      .as[(Long, Long, Option[Long], Option[Double])].collect.toSeq
    assert(out == Seq(
      (1L, 2L, None, None),           // no match at all
      (1L, 5L, Some(5L), Some(50.0)), // exact-time match, staleness 0
      (1L, 10L, Some(9L), Some(90.0)), // staleness 1 == tolerance
      (2L, 7L, None, None)))
  }

  test("asofJoin: null keys match nothing, as in SQL join semantics") {
    val l = Seq((Some(1L), 10L, "a"), (None, 10L, "b"))
      .toDF("k", "lt", "lv")
    val r = Seq((Some(1L), 5L, 1.0), (None, 5L, 9.0))
      .toDF("k", "rt", "rv")
    val out = AsOf.asofJoin(l, r, "k", "lt", "rt", Seq("rv"))
      .orderBy("lv")
      .select("lv", "asof_rt", "asof_rv")
      .as[(String, Option[Long], Option[Double])].collect.toSeq
    // the null-key left row passes through unenriched
    assert(out == Seq(("a", Some(5L), Some(1.0)), ("b", None, None)))
  }

  // ---- interval join ----

  test("pointInInterval matches inclusively and only inside the interval") {
    val pts = Seq((1L, 0L, "a"), (1L, 10L, "b"), (1L, 20L, "c"),
      (1L, 21L, "d"), (2L, 10L, "e")).toDF("k", "us", "tag")
    val ivs = Seq((1L, 10L, 20L, "iv1"), (2L, 0L, 5L, "iv2"))
      .toDF("k", "lo", "hi", "ivl")
    val out = IntervalJoin.pointInInterval(pts, ivs, "k", "us", "lo", "hi",
      bucketUs = 7L)
      .orderBy("us")
      .select("k", "us", "tag", "ivl")
      .as[(Long, Long, String, String)].collect.toSeq
    // 10 and 20 are inside [10,20] (inclusive both ends); 0, 21 outside;
    // key 2's point at 10 is outside [0,5]
    assert(out == Seq((1L, 10L, "b", "iv1"), (1L, 20L, "c", "iv1")))
  }

  test("pointInInterval emits one row per matching pair across bucket spans") {
    // interval spans many buckets; every in-range point matches exactly once
    val pts = (0L to 50L).map(u => (1L, u)).toDF("k", "us")
    val ivs = Seq((1L, 5L, 45L)).toDF("k", "lo", "hi")
    val out = IntervalJoin.pointInInterval(pts, ivs, "k", "us", "lo", "hi",
      bucketUs = 4L)
    assert(out.count() == 41)
    assert(out.select("us").distinct.count() == 41)
  }

  // ---- changelog compaction ----

  test("compactLatest keeps the newest row per key, tiebreak deterministic") {
    val log = Seq(
      (1L, "a", 10L, 100L, 1.0), (1L, "a", 20L, 101L, 2.0),
      (1L, "a", 20L, 102L, 3.0), // same ts, higher event_id wins
      (1L, "b", 5L, 103L, 4.0), (2L, "a", 1L, 104L, 5.0))
      .toDF("user_id", "event_type", "ts_us", "event_id", "value")
    val out = Sessionize.compactLatest(log, Seq("user_id", "event_type"),
      "ts_us", "event_id")
      .orderBy("user_id", "event_type")
      .as[(Long, String, Long, Long, Double)].collect.toSeq
    assert(out == Seq(
      (1L, "a", 20L, 102L, 3.0),
      (1L, "b", 5L, 103L, 4.0),
      (2L, "a", 1L, 104L, 5.0)))
  }

  test("compactLatest plans a partial-combining aggregate, one exchange") {
    withStaticPlans {
      val log = (0 until 5000)
        .map(i => ((i % 50).toLong, "t" + (i % 3), i.toLong, i.toLong))
        .toDF("user_id", "event_type", "ts_us", "event_id")
      val out = Sessionize.compactLatest(log, Seq("user_id", "event_type"),
        "ts_us", "event_id")
      val plan = out.queryExecution.executedPlan.toString
      // the load-bearing property: a PARTIAL max_by below the exchange
      // (map-side combine to one candidate per key — the shuffle moves
      // O(keys)), no Window operator anywhere
      assert(plan.contains("partial_max_by"),
        s"expected map-side partial max_by:\n$plan")
      assert(!plan.contains("Window"), s"window shape regressed:\n$plan")
      assert(shuffleCount(out) == 1)
    }
  }

  test("applyChangelog: latest tombstone deletes, later upsert resurrects") {
    val log = Seq(
      // key 1: upsert then delete -> absent
      (1L, 10L, 100L, Some("U"), 1.0), (1L, 20L, 101L, Some("D"), 0.0),
      // key 2: delete then later upsert -> resurrected with the upsert
      (2L, 10L, 102L, Some("D"), 0.0), (2L, 30L, 103L, Some("U"), 2.0),
      // key 3: same-ts tie -> higher event_id wins; it is a delete
      (3L, 10L, 104L, Some("U"), 3.0), (3L, 10L, 105L, Some("D"), 0.0),
      // key 4: plain upsert survives
      (4L, 5L, 106L, Some("U"), 4.0),
      // key 5: NULL op is NOT a tombstone -> the key survives
      (5L, 7L, 107L, None, 5.0))
      .toDF("user_id", "ts_us", "event_id", "op", "value")
    val out = Sessionize.applyChangelog(log, Seq("user_id"), "ts_us",
      "event_id", "op", deleteOp = "D")
      .orderBy("user_id")
      .as[(Long, Long, Long, Option[String], Double)].collect.toSeq
    assert(out == Seq(
      (2L, 30L, 103L, Some("U"), 2.0),
      (4L, 5L, 106L, Some("U"), 4.0),
      (5L, 7L, 107L, None, 5.0)))
  }

  test("scdIntervals: validity chain, zero-width ties, current = compactLatest") {
    val log = Seq(
      (1L, 10L, 100L, 1.0), (1L, 20L, 101L, 2.0), (1L, 20L, 102L, 3.0),
      (2L, 5L, 103L, 4.0))
      .toDF("user_id", "ts_us", "event_id", "value")
    val out = Sessionize.scdIntervals(log, Seq("user_id"), "ts_us",
        "event_id")
      .orderBy("user_id", "valid_from_us", "event_id")
      .select("user_id", "event_id", "valid_from_us", "valid_to_us",
        "is_current")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("valid_from_us"),
        Option(r.getAs[java.lang.Long]("valid_to_us")).map(_.toLong),
        r.getAs[Boolean]("is_current")))
    assert(out.toSeq == Seq(
      (1L, 100L, 10L, Some(20L), false),
      (1L, 101L, 20L, Some(20L), false), // same-ts tie: zero-width version
      (1L, 102L, 20L, None, true),
      (2L, 103L, 5L, None, true)))
    // the current row per key is exactly what compactLatest keeps
    val current = Sessionize.scdIntervals(log, Seq("user_id"), "ts_us",
        "event_id")
      .filter(col("is_current"))
      .select("user_id", "ts_us", "event_id", "value")
      .orderBy("user_id").collect().toSeq
    val compacted = Sessionize.compactLatest(log, Seq("user_id"), "ts_us",
        "event_id")
      .orderBy("user_id").collect().toSeq
    assert(current == compacted)
  }

  test("hoppingCounts: each event lands in size/slide windows, tiled") {
    // 2s windows sliding 1s; events at 0.5s, 1.5s, 1.9s
    val ev = Seq((500000L, "x"), (1500000L, "x"), (1900000L, "y"))
      .toDF("us", "t")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Sessionize.hoppingCounts(ev, "ts", "2 seconds", "1 second",
        Seq("t"))
      .orderBy("w_start_us", "t")
      .as[(Long, Long, String, Long)].collect.toSeq
    // event at 0.5s -> windows [-1,1) and [0,2); 1.5s -> [0,2),[1,3); 1.9s same
    assert(out == Seq(
      (-1000000L, 1000000L, "x", 1L),
      (0L, 2000000L, "x", 2L),
      (0L, 2000000L, "y", 1L),
      (1000000L, 3000000L, "x", 1L),
      (1000000L, 3000000L, "y", 1L)))
    // every window is exactly size long and total row-slots = events * 2
    assert(out.forall(w => w._2 - w._1 == 2000000L))
    assert(out.map(_._4).sum == 6L)
  }

  test("scdIntervals and hoppingCounts each plan exactly one exchange") {
    withStaticPlans {
      val log = (0 until 2000)
        .map(i => ((i % 40).toLong, i.toLong, i.toLong, i * 0.5))
        .toDF("user_id", "ts_us", "event_id", "value")
      assert(shuffleCount(Sessionize.scdIntervals(log, Seq("user_id"),
        "ts_us", "event_id")) == 1)
      val ev = (0 until 2000)
        .map(i => (new java.sql.Timestamp(i * 977L), "t" + (i % 3)))
        .toDF("ts", "t")
      val hop = Sessionize.hoppingCounts(ev, "ts", "2 seconds",
        "1 second", Seq("t"))
      assert(shuffleCount(hop) == 1)
      // the window replication (expand) must sit BELOW the partial
      // aggregate so the exchange moves combined (window, dim) cells,
      // not per-event rows
      val plan = hop.queryExecution.executedPlan.toString
      assert(plan.contains("partial_count") || plan.contains("Partial"),
        s"expected a map-side partial aggregate:\n$plan")
    }
  }

  test("debounce flags chained bursts, keeping only the first row") {
    import spark.implicits._
    // key A: burst at 0,5,9,14 (each gap <= 5) then 100; key B: all clear
    val log = Seq(
      ("A", 0L, 1L), ("A", 5L, 2L), ("A", 9L, 3L), ("A", 14L, 4L),
      ("A", 100L, 5L),
      ("B", 0L, 6L), ("B", 50L, 7L))
      .toDF("k", "ts_us", "event_id")
    val out = Sessionize.debounce(log, Seq("k"), "ts_us", "event_id",
      toleranceUs = 5L)
      .collect().map(r => r.getLong(2) -> r.getBoolean(4)).toMap
    // chained semantics: 9 is within 5 of 5 (a dropped row) -> dropped;
    // 14 within 5 of 9 -> dropped; 100 far from 14 -> kept
    assert(out === Map(1L -> true, 2L -> false, 3L -> false, 4L -> false,
      5L -> true, 6L -> true, 7L -> true))
    // equal timestamps: tiebreak keeps the smaller event_id
    val ties = Seq(("C", 0L, 9L), ("C", 0L, 8L)).toDF("k", "ts_us", "event_id")
    val t = Sessionize.debounce(ties, Seq("k"), "ts_us", "event_id", 5L)
      .collect().map(r => r.getLong(2) -> r.getBoolean(4)).toMap
    assert(t === Map(8L -> true, 9L -> false))
  }
}
