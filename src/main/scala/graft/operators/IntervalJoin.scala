package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join via fixed-width bucket
  * decomposition. Spark plans a raw `pt BETWEEN lo AND hi` join as a
  * per-key nested loop — quadratic per key, hopeless at scale. Here
  * each interval explodes to the fixed-width buckets it covers and
  * each point maps to exactly one bucket, so the join is a plain
  * equi-join on (key, bucket) followed by the exact BETWEEN filter:
  * shuffle currency is (key, bucket), candidate volume is
  * |points| + Σ interval_width/bucketUs — the standard range-join
  * optimization. Pick bucketUs near the typical interval width: too
  * small inflates the interval explode, too large inflates the
  * candidate filter.
  */
object IntervalJoin {

  /** Inclusive on both bounds. Each matching (point, interval) pair
    * emits exactly one row (a point joins an interval only through the
    * point's own bucket), carrying all columns of both inputs — the
    * caller disambiguates overlapping names beforehand.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      key: String, ptUs: String, loUs: String, hiUs: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive: $bucketUs")
    // integer `div` (not `/`): double division corrupts µs epochs
    val iv = intervals.withColumn("__bkt",
      explode(sequence(expr(s"`$loUs` div ${bucketUs}L"),
        expr(s"`$hiUs` div ${bucketUs}L"))))
    val pt = points.withColumn("__bkt", expr(s"`$ptUs` div ${bucketUs}L"))
    pt.join(iv, Seq(key, "__bkt"))
      .filter(col(ptUs) >= col(loUs) && col(ptUs) <= col(hiUs))
      .drop("__bkt")
  }
}
