package graft
/** Dev-only: time a named subset of SparkEntry.queries (same warmup +
  * median-of-3 discipline as Bench) — used for A/B experiments on
  * single stages.
  */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val names = args.toSeq
    val spark = Sessions.local()
    names.foreach { n =>
      try { Force.force(SparkEntry.queries(n)(spark, sfDir)) } catch { case _: Throwable => () }
      finally graft.core.Caches.unpersistAll()
    }
    val results = names.map { n =>
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        Force.force(SparkEntry.queries(n)(spark, sfDir))
        graft.core.Caches.unpersistAll()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      n -> samples(samples.size / 2)
    }
    results.foreach { case (n, t) => println(f"BENCHSUBSET $n%-20s $t%8.2f s") }
    spark.stop()
  }
}
