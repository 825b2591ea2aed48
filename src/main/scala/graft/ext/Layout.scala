package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Storage-layout operators: bucketed table materialization and the
  * co-located join it buys. Bucketing is the 100 TB answer to a
  * repeated fact-fact join: the shuffle is paid ONCE at layout time
  * (each side hash-partitioned into `buckets` files by the join key),
  * and every subsequent join of the two tables is exchange-free — the
  * scan itself reports the hash partitioning, so sort-merge join reads
  * bucket i against bucket i with no network movement of either fact
  * table. LayoutSpec pins the plan: with broadcast disabled, the only
  * exchange in the whole query is the final (tiny) aggregate's.
  */
object Layout {

  /** Drop a managed table AND its warehouse directory. The session
    * catalog is in-memory, so a table written by a previous session
    * leaves files the catalog no longer knows about; CREATE would then
    * refuse the non-empty location. Deleting both sides makes the
    * materialization idempotent across sessions.
    */
  private def dropTable(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = new Path(spark.conf.get("spark.sql.warehouse.dir"), name)
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(wh, true)
  }

  /** Materialize `df` as a managed parquet table bucketed (and
    * per-bucket sorted) by `key`. Sorting inside each bucket file lets
    * the bucketed sort-merge join skip its sort when each bucket is a
    * single file.
    */
  def writeBucketed(df: DataFrame, name: String, key: String,
      buckets: Int): DataFrame = {
    val spark = df.sparkSession
    dropTable(spark, name)
    df.write.format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(name)
    // drop any stale cached listing from a previous materialization of
    // the same table name (the file-status cache has no TTL)
    spark.catalog.refreshTable(name)
    spark.table(name)
  }

  /** orders ⋈ lineitem through the bucketed layout: both sides are
    * materialized bucketed by the order key, then joined and rolled up
    * by priority. The aggregate uses decimal-quantized sums (exact,
    * order-independent) so the result is reproducible bit-for-bit at
    * any parallelism. Output: o_orderpriority, n_items, sum_qty,
    * sum_price.
    */
  def bucketedOrdersJoin(spark: SparkSession, dir: String,
      buckets: Int = 8, prefix: String = "graft_bkt"): DataFrame = {
    val bo = writeBucketed(
      Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority"),
      s"${prefix}_orders", "o_orderkey", buckets)
    val bl = writeBucketed(
      Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_quantity", "l_extendedprice"),
      s"${prefix}_lineitem", "l_orderkey", buckets)
    bucketedJoinAgg(bo, bl)
  }

  /** The join+rollup over two already-bucketed tables (split out so
    * the plan guard can assert on exactly this plan).
    */
  def bucketedJoinAgg(bo: DataFrame, bl: DataFrame): DataFrame =
    bo.join(bl, bo("o_orderkey") === bl("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(round(col("l_quantity"), 2).cast(DecimalType(30, 2)))
          .cast("double").as("sum_qty"),
        sum(round(col("l_extendedprice"), 2).cast(DecimalType(30, 2)))
          .cast("double").as("sum_price"))
}
