package graft

import org.apache.spark.sql.functions._
import graft.core.{SeriesSpec, TimeIndex}
import graft.operators.{Gaps, Runs, Seasonal}

/** Micro-fixtures for the SURVEY §4.2 semantic traps (FIXTURES.md §C). */
class RunsSpec extends SparkTestBase {

  private val spec = SeriesSpec(Seq("series"))

  // -- gap_first_sample: gap masks ONLY the first post-gap point ------------
  test("gap masks only the first post-gap sample") {
    val df = series(
      ("2024-01-01 00:00:00", v(1.0)),
      ("2024-01-01 00:15:00", v(2.0)),
      ("2024-01-01 05:00:00", v(3.0)), // >2h after prev -> masked
      ("2024-01-01 05:15:00", v(4.0))) // NOT masked
    val out = Gaps(TimeIndex.withDeltaUs(df, spec), spec, gapHours = 2.0)
      .orderBy("ts").select("value").collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(Some(1.0), Some(2.0), None, Some(4.0)))
  }

  // -- flat_run_offset: start = 2nd sample; end = sample after run ----------
  test("flat run start at second sample of stretch, end one past, >=2h kept") {
    val df = series(
      ("2024-01-01 00:00:00", v(5.0)),
      ("2024-01-01 01:00:00", v(5.0)), // eq -> run starts HERE
      ("2024-01-01 02:00:00", v(5.0)), // eq
      ("2024-01-01 03:00:00", v(7.0)), // run end boundary -> event end ts
      ("2024-01-01 04:00:00", v(7.0))) // eq run of 1: end clamps to last idx? no: after=04:00+?
    val runs = Runs.flatValues(df, spec, minHours = 2.0)
      .orderBy("start").collect()
    assert(runs.length == 1) // second run (7.0 x2) spans 1h only -> dropped...
    val r = runs.head
    assert(r.getAs[java.sql.Timestamp]("start").toString.startsWith("2024-01-01 01:00:00"))
    assert(r.getAs[java.sql.Timestamp]("end").toString.startsWith("2024-01-01 03:00:00"))
    assert(r.getAs[Double]("hours") == 2.0)
    assert(r.getAs[Double]("value") == 5.0)
  }

  test("flat run reaching series end clamps end to last sample") {
    val df = series(
      ("2024-01-01 00:00:00", v(1.0)),
      ("2024-01-01 01:00:00", v(5.0)),
      ("2024-01-01 02:00:00", v(5.0)),
      ("2024-01-01 04:00:00", v(5.0)))
    val runs = Runs.flatValues(df, spec, minHours = 2.0).collect()
    assert(runs.length == 1)
    assert(runs.head.getAs[java.sql.Timestamp]("start").toString.startsWith("2024-01-01 02:00:00"))
    assert(runs.head.getAs[java.sql.Timestamp]("end").toString.startsWith("2024-01-01 04:00:00"))
  }

  test("NaN/null values never extend a flat run") {
    val df = series(
      ("2024-01-01 00:00:00", v(5.0)),
      ("2024-01-01 01:00:00", na),
      ("2024-01-01 02:00:00", v(5.0)),
      ("2024-01-01 03:00:00", v(5.0)))
    // only one eq pair (02->03): run start 03:00, 1h to end-of-series clamp -> 0h -> dropped
    assert(Runs.flatValues(df, spec, minHours = 2.0).count() == 0)
  }

  // -- binary_switch_edges --------------------------------------------------
  test("binary switch with finite nonzero neighbors emits pre/post values") {
    val df = series(
      ("2024-01-01 00:00:00", v(12.5)),
      ("2024-01-01 01:00:00", v(0.0)),
      ("2024-01-01 02:00:00", v(0.0)),
      ("2024-01-01 03:00:00", v(8.0)))
    val e = Runs.binarySwitches(df, spec).collect()
    assert(e.length == 1)
    val r = e.head
    assert(r.getAs[java.sql.Timestamp]("start").toString.startsWith("2024-01-01 01:00:00"))
    assert(r.getAs[java.sql.Timestamp]("end").toString.startsWith("2024-01-01 02:00:00"))
    assert(r.getAs[java.sql.Timestamp]("pre").toString.startsWith("2024-01-01 00:00:00"))
    assert(r.getAs[java.sql.Timestamp]("post").toString.startsWith("2024-01-01 03:00:00"))
    assert(r.getAs[Double]("pre_val") == 12.5 && r.getAs[Double]("post_val") == 8.0)
  }

  test("zero-run with null neighbor emits nothing; edge run clamps indices") {
    val nullNeighbor = series(
      ("2024-01-01 00:00:00", na),
      ("2024-01-01 01:00:00", v(0.0)),
      ("2024-01-01 02:00:00", v(8.0)))
    assert(Runs.binarySwitches(nullNeighbor, spec).count() == 0)
    // run at series start: pre clamps to the run's own first sample (0.0),
    // post finite nonzero -> event survives (0 != 0 or 8 != 0)
    val edge = series(
      ("2024-01-01 00:00:00", v(0.0)),
      ("2024-01-01 01:00:00", v(8.0)))
    val e = Runs.binarySwitches(edge, spec).collect()
    assert(e.length == 1 && e.head.getAs[Double]("pre_val") == 0.0)
    // all-zero series: pre and post both clamp to zeros -> suppressed
    val allZero = series(
      ("2024-01-01 00:00:00", v(0.0)),
      ("2024-01-01 01:00:00", v(0.0)))
    assert(Runs.binarySwitches(allZero, spec).count() == 0)
  }

  // -- isolated_group -------------------------------------------------------
  test("isolated: short finite run fenced by >3h gaps on both sides") {
    val df = series(
      ("2024-01-01 00:00:00", v(1.0)),
      ("2024-01-01 00:15:00", na),      // break the finite run
      ("2024-01-01 04:00:00", v(2.0)),  // isolated: 3h45 gap before, 4h after
      ("2024-01-01 08:00:00", na),
      ("2024-01-01 08:15:00", v(3.0)))  // right gap only 15min -> not isolated
    val d = TimeIndex.withDeltaUs(df, spec)
    val step = TimeIndex.inferStep(d, spec)
    val out = Runs.isolatedMask(d, spec, step, gapHours = 3.0)
      .orderBy("ts").select("isolated").collect().map(_.getBoolean(0))
    assert(out.toSeq == Seq(false, false, true, false, false))
  }

  // -- dup_keepfirst_then_median -------------------------------------------
  test("dedup keep-first by tiebreaker precedes everything") {
    import spark.implicits._
    val df = Seq(
      ("s", "2024-01-01 00:00:00", 1.0, 10L),
      ("s", "2024-01-01 00:00:00", 99.0, 11L), // dropped (later tiebreak)
      ("s", "2024-01-01 00:15:00", 2.0, 12L))
      .toDF("series", "ts_s", "value", "seq")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    val out = TimeIndex.dedupKeepFirst(df, spec, col("seq"))
      .orderBy("ts").select("value").as[Double].collect()
    assert(out.toSeq == Seq(1.0, 2.0))
  }

  // -- season_multiyear_coverage -------------------------------------------
  test("seasonal expected points span first-to-last ts per season across years") {
    val df = series(
      ("2023-01-01 00:00:00", v(1.0)), // DJF year 1
      ("2024-01-01 00:00:00", v(2.0)), // DJF year 2 -> expected spans a full year
      ("2023-06-01 00:00:00", v(3.0))) // JJA singleton
    val d = TimeIndex.withDeltaUs(df, spec)
    // force step to 1 day for easy arithmetic
    val step = d.groupBy("series").agg(lit(86400.0 * 1e6).as("step_us"))
    val out = Seasonal.stats(d, spec, step).collect()
      .map(r => r.getAs[String]("season") -> r.getAs[Long]("expected_pts")).toMap
    assert(out("DJF") == 366L) // 2023-01-01..2024-01-01 = 365d span + 1 step
    assert(out("JJA") == 1L)
  }
}
