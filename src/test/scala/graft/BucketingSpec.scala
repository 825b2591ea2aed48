package graft

import org.apache.spark.sql.functions._

/** Scale-design evidence: bucketed tables co-locate repeated joins on
  * the series key — the join below runs WITHOUT any Exchange in the
  * physical plan. At cluster scale this is how the per-series
  * aggregates (step, sentinel activations, run quals) join back to
  * the long table without reshuffling the big side every time.
  */
class BucketingSpec extends SparkTestBase {

  test("join of two tables bucketed by the series key needs no shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import spark.implicits._
      val ev = (0 until 2000).map(i => (i.toLong % 50, i.toLong, i * 1.5))
        .toDF("user_id", "event_id", "value")
      ev.write.mode("overwrite").bucketBy(8, "user_id")
        .saveAsTable("ev_bucketed")
      ev.groupBy("user_id").agg(avg("value").as("m"))
        .write.mode("overwrite").bucketBy(8, "user_id")
        .saveAsTable("stats_bucketed")
      val joined = spark.table("ev_bucketed")
        .join(spark.table("stats_bucketed"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() == 2000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ev_bucketed")
      spark.sql("DROP TABLE IF EXISTS stats_bucketed")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
