package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one named query N times (after a warmup) to compare
  * plan variants without running the whole bench.
  * Usage: runMain graft.Profile <queryName> [sfDir] [reps]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = Sessions.local()
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = try SparkEntry.queries(name)(spark, dir).count()
      finally graft.core.Caches.unpersistAll(blocking = true)
      println(f"[profile] $name rep $r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
