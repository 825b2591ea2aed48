package graft
import org.apache.spark.sql.SparkSession

/** Local stand-in for the driver's t1 smoke: entry() must return >0 rows. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    val df = SparkEntry.entry(spark)
    println(s"[smoke] entry rows=${df.count()} cols=${df.columns.mkString(",")}")
    spark.stop()
  }
}
