package graft
import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan of a query. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Sessions.local("4")
    SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
