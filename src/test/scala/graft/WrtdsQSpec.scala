package graft

import org.apache.spark.sql.functions._
import graft.core.SeriesSpec
import graft.wrtds.Wrtds

/** Exercise the WRTDS discharge-kernel path (wrtds_proxy with a q
  * column, ufz_water_qc_pipeline.py:599, :610-611): with y a function
  * of discharge plus season, the q-kernel regression recovers the
  * signal.
  */
class WrtdsQSpec extends SparkTestBase {

  test("wrtds with discharge kernel fits y = f(q, season)") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = (0 until 400).map { i =>
      val q = 10.0 + 5.0 * math.sin(2 * math.Pi * i / 50.0) + rng.nextDouble()
      val doySignal = 8 * math.sin(2 * math.Pi * i / 365.25)
      ("s", java.time.LocalDateTime.of(2022, 1, 1, 12, 0, 0).plusDays(i.toLong)
        .toString.replace('T', ' '), 3.0 * q + doySignal + 40.0, q)
    }
    val df = rows.toDF("series", "ts_s", "value", "discharge")
      .withColumn("ts", to_timestamp($"ts_s"))
      .select("series", "ts", "value", "discharge")
    val spec = SeriesSpec(Seq("series"))
    val fit = Wrtds.proxy(df, spec, qCol = Some("discharge"))
    val stats = fit.agg(
      count(col("wrtds_resid")).as("n"),
      median(abs(col("wrtds_resid"))).as("medAbs")).head()
    assert(stats.getAs[Long]("n") > 300) // fitted for most points
    assert(stats.getAs[Double]("medAbs") < 2.0) // signal recovered
  }
}
