package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{SeriesSpec, TimeIndex}
import graft.operators.{Gaps, Runs, Seasonal}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query here has a DuckDB oracle in `oracleSql` computing the
  * exact same values on the same parquet tables. Cross-engine float
  * determinism rules used throughout:
  *  - money/decimal sums go through DecimalType (exact, order-free)
  *    and cast to double at the end;
  *  - medians/order statistics are exact in both engines;
  *  - derived percentages are round(x, 6) on identically-shaped
  *    expressions so both engines round the same IEEE double.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_seasonal_summary")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- helpers

  private val evSpec: SeriesSpec = Tables.eventsSpec

  /** events → deduped long series with delta_us (shared prefix of the
    * time-series queries).
    */
  private def seriesWithDelta(s: SparkSession, dir: String): DataFrame =
    TimeIndex.withDeltaUs(Tables.eventsSeries(s, dir), evSpec)

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.4 aggregation plumbing on lineitem (TPC-H Q1 shape).
    "q1_pricing" -> ((s, dir) => {
      val ep = col("l_extendedprice").cast(DecimalType(12, 2))
      val disc = col("l_discount").cast(DecimalType(4, 2))
      val tax = col("l_tax").cast(DecimalType(4, 2))
      val one = lit(1).cast(DecimalType(3, 2))
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum(ep).cast("double").as("sum_base_price"),
          sum(ep * (one - disc)).cast("double").as("sum_disc_price"),
          sum(ep * (one - disc) * (one + tax)).cast("double").as("sum_charge"),
          avg("l_quantity").as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // §2.4 step inference: per-series median positive timestamp delta.
    "q_step_infer" -> ((s, dir) => {
      TimeIndex.inferStep(seriesWithDelta(s, dir), evSpec)
    }),

    // §2.4/§2.5 flagship slice: dedup → delta → gap mask → seasonal
    // coverage stats (EP1's seasonal_stats leg).
    "q_seasonal_summary" -> ((s, dir) => {
      val d = seriesWithDelta(s, dir)
      val step = TimeIndex.inferStep(d, evSpec)
      val clean = Gaps(d, evSpec, gapHours = 2.0)
      Seasonal.stats(clean, evSpec, step)
        .select("user_id", "season", "n_obs", "n_missing", "expected_pts",
          "coverage_pct", "nan_pct")
    }),

    // §2.0/§2.5 RLE: flat-value runs on a quantized signal (raw random
    // doubles never repeat; bucketing models sensor quantization).
    "q_flat_runs" -> ((s, dir) => {
      val q = Tables.eventsSeries(s, dir)
        .withColumn("value", round(col("value") / 20))
      Runs.flatValues(q, evSpec, minHours = 2.0, absTol = 0.0)
        .select(col("user_id"), unix_micros(col("start")).as("start_us"),
          unix_micros(col("end")).as("end_us"),
          round(col("hours"), 6).as("hours"), col("value"))
    }),

    // §2.5 binary-switch events (zero-runs with finite non-zero
    // neighbors); tol=1.0 = "near-zero reading" on this data.
    "q_binary_switches" -> ((s, dir) => {
      Runs.binarySwitches(Tables.eventsSeries(s, dir), evSpec, zeroTol = 1.0)
        .select(col("user_id"), unix_micros(col("start")).as("start_us"),
          unix_micros(col("end")).as("end_us"),
          unix_micros(col("pre")).as("pre_us"),
          unix_micros(col("post")).as("post_us"),
          col("pre_val"), col("post_val"))
    }),

    // §2.5 isolated-group mask: short finite runs fenced by >3h gaps;
    // missing values modeled by masking low readings.
    "q_isolated" -> ((s, dir) => {
      val d = seriesWithDelta(s, dir)
      val step = TimeIndex.inferStep(d, evSpec)
      val masked = d.withColumn("value",
        when(col("value") < 10, lit(null)).otherwise(col("value")))
      Runs.isolatedMask(masked, evSpec, step, gapHours = 3.0)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("isolated"))
    })
  )

  // ------------------------------------------------------------- oracle SQL

  /** Shared oracle CTE prefix: events deduped keep-first by event_id,
    * with per-row delta_us (µs; DuckDB reads the ns parquet truncated
    * to µs exactly like our `ts div 1000`).
    */
  private val seriesCte: String =
    """WITH d AS (
      |  SELECT user_id, ts, value,
      |         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
      |  FROM events
      |), dd AS (
      |  SELECT user_id, ts, value,
      |         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS delta_us
      |  FROM d WHERE rn = 1
      |)""".stripMargin

  private val stepCte: String =
    """, st AS (
      |  SELECT user_id,
      |         CASE WHEN count(*) < 3
      |                OR median(CASE WHEN delta_us > 0 THEN delta_us END) IS NULL
      |              THEN 900000000.0
      |              ELSE median(CASE WHEN delta_us > 0 THEN delta_us END) END AS step_us
      |  FROM dd GROUP BY user_id
      |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  avg(l_quantity) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_step_infer" ->
      (seriesCte + stepCte + "\nSELECT user_id, step_us FROM st"),

    "q_flat_runs" ->
      (seriesCte +
        """, q AS (
          |  SELECT user_id, ts, round(value/20) AS v FROM dd
          |), f AS (
          |  SELECT user_id, ts, v,
          |         coalesce(abs(v - lag(v) OVER (PARTITION BY user_id ORDER BY ts)) <= 0.0, false) AS eq,
          |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS next_ts
          |  FROM q
          |), c AS (
          |  SELECT *, CASE WHEN eq IS DISTINCT FROM lag(eq) OVER (PARTITION BY user_id ORDER BY ts) THEN 1 ELSE 0 END AS chg
          |  FROM f
          |), r AS (
          |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS run_id
          |  FROM c
          |), g AS (
          |  SELECT user_id, ts, v, run_id,
          |         row_number() OVER (PARTITION BY user_id, run_id ORDER BY ts) AS rn2,
          |         last_value(ts) OVER (PARTITION BY user_id, run_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ts,
          |         last_value(next_ts) OVER (PARTITION BY user_id, run_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS after_ts
          |  FROM r WHERE eq
          |)
          |SELECT user_id, epoch_us(ts) AS start_us,
          |       epoch_us(coalesce(after_ts, last_ts)) AS end_us,
          |       round((epoch_us(coalesce(after_ts, last_ts)) - epoch_us(ts)) / 3600000000.0, 6) AS hours,
          |       v AS value
          |FROM g
          |WHERE rn2 = 1
          |  AND (epoch_us(coalesce(after_ts, last_ts)) - epoch_us(ts)) / 3600000000.0 >= 2.0""".stripMargin),

    "q_binary_switches" ->
      (seriesCte +
        """, f AS (
          |  SELECT user_id, ts, value,
          |         coalesce(abs(value) <= 1.0, false) AS z,
          |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts,
          |         lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS prev_val,
          |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS next_ts,
          |         lead(value) OVER (PARTITION BY user_id ORDER BY ts) AS next_val
          |  FROM dd
          |), c AS (
          |  SELECT *, CASE WHEN z IS DISTINCT FROM lag(z) OVER (PARTITION BY user_id ORDER BY ts) THEN 1 ELSE 0 END AS chg
          |  FROM f
          |), r AS (
          |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS run_id
          |  FROM c
          |), g AS (
          |  SELECT user_id, ts, value, prev_ts, prev_val, run_id,
          |         row_number() OVER (PARTITION BY user_id, run_id ORDER BY ts) AS rn2,
          |         last_value(ts) OVER (PARTITION BY user_id, run_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ts,
          |         last_value(value) OVER (PARTITION BY user_id, run_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_val,
          |         last_value(next_ts) OVER (PARTITION BY user_id, run_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS ln_ts,
          |         last_value(next_val) OVER (PARTITION BY user_id, run_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS ln_val
          |  FROM r WHERE z
          |), e AS (
          |  SELECT user_id, epoch_us(ts) AS start_us, epoch_us(last_ts) AS end_us,
          |         epoch_us(coalesce(prev_ts, ts)) AS pre_us,
          |         epoch_us(coalesce(ln_ts, last_ts)) AS post_us,
          |         CASE WHEN prev_ts IS NOT NULL THEN prev_val ELSE value END AS pre_val,
          |         CASE WHEN ln_ts IS NOT NULL THEN ln_val ELSE last_val END AS post_val
          |  FROM g WHERE rn2 = 1
          |)
          |SELECT * FROM e
          |WHERE pre_val IS NOT NULL AND post_val IS NOT NULL
          |  AND (pre_val <> 0.0 OR post_val <> 0.0)""".stripMargin),

    "q_isolated" ->
      (seriesCte + stepCte +
        """, m AS (
          |  SELECT user_id, ts, delta_us,
          |         CASE WHEN value < 10 THEN NULL ELSE value END AS vm,
          |         lead(delta_us) OVER (PARTITION BY user_id ORDER BY ts) AS next_delta
          |  FROM dd
          |), f AS (
          |  SELECT *, (vm IS NOT NULL) AS z FROM m
          |), c AS (
          |  SELECT *, CASE WHEN z IS DISTINCT FROM lag(z) OVER (PARTITION BY user_id ORDER BY ts) THEN 1 ELSE 0 END AS chg
          |  FROM f
          |), r AS (
          |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS run_id
          |  FROM c
          |), g AS (
          |  SELECT user_id, ts, delta_us, run_id,
          |         row_number() OVER (PARTITION BY user_id, run_id ORDER BY ts) AS rn2,
          |         count(*) OVER (PARTITION BY user_id, run_id) AS len,
          |         last_value(next_delta) OVER (PARTITION BY user_id, run_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS right_d
          |  FROM r WHERE z
          |), qual AS (
          |  SELECT g.user_id, g.run_id
          |  FROM g JOIN st s ON g.user_id = s.user_id
          |  WHERE rn2 = 1
          |    AND len <= greatest(1, CAST(floor(1800000000.0 / s.step_us + 0.5) AS BIGINT))
          |    AND delta_us > 10800000000 AND right_d > 10800000000
          |)
          |SELECT r.user_id, epoch_us(r.ts) AS ts_us,
          |       (r.z AND q.run_id IS NOT NULL) AS isolated
          |FROM r LEFT JOIN qual q ON r.user_id = q.user_id AND r.run_id = q.run_id""".stripMargin),

    "q_seasonal_summary" ->
      (seriesCte + stepCte +
        """, g AS (
          |  SELECT user_id, ts,
          |         CASE WHEN delta_us > 7200000000 THEN NULL ELSE value END AS value_clean,
          |         CASE WHEN month(ts) IN (12,1,2) THEN 'DJF'
          |              WHEN month(ts) IN (3,4,5) THEN 'MAM'
          |              WHEN month(ts) IN (6,7,8) THEN 'JJA'
          |              ELSE 'SON' END AS season
          |  FROM dd
          |), a AS (
          |  SELECT user_id, season, count(*) AS n_obs,
          |         count(*) - count(value_clean) AS n_missing,
          |         min(epoch_us(ts)) AS mn_us, max(epoch_us(ts)) AS mx_us
          |  FROM g GROUP BY user_id, season
          |)
          |SELECT a.user_id, a.season, a.n_obs, a.n_missing,
          |       greatest(1, CAST(floor((a.mx_us - a.mn_us + s.step_us) / s.step_us + 0.5) AS BIGINT)) AS expected_pts,
          |       round(100.0 * (a.n_obs - a.n_missing) / greatest(1, CAST(floor((a.mx_us - a.mn_us + s.step_us) / s.step_us + 0.5) AS BIGINT)), 6) AS coverage_pct,
          |       round(100.0 * a.n_missing / a.n_obs, 6) AS nan_pct
          |FROM a JOIN st s ON a.user_id = s.user_id""".stripMargin)
  )
}
