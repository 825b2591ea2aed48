package graft

import org.apache.spark.sql.SparkSession

/** The one local SparkSession factory every entry point uses — the
  * configs must agree (Tables.events requires nanosAsLong at session
  * construction; bench parallelism must match shuffle partitions), so
  * they live in exactly one place.
  */
object Sessions {

  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
    Runtime.getRuntime.availableProcessors().toString)

  def local(nThreads: String = cpus): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$nThreads]")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", nThreads)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
