package graft
import org.apache.spark.sql.SparkSession

/** Local stand-in for the driver's t1 smoke: entry() must return >0 rows. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println(s"[smoke] entry rows=${df.count()} cols=${df.columns.mkString(",")}")
    spark.stop()
  }
}
