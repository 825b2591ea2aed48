package graft

/** Dev tool: print one registry query's formatted physical plan and
  * time a cold + a warm honest execution (`Force.force`) — the
  * per-query loupe next to [[Bench]]'s sweep (run via
  * `tools/run_main.sh graft.ExplainQ <query> [sfDir]`). Not part of
  * the engine surface; the [[GoldenBench]]/[[SpillBench]] family.
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.local()
    val df = SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    Force.force(df)
    println(f"[explainq] $name forced in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    graft.core.Caches.unpersistAll()
    val t1 = System.nanoTime()
    Force.force(SparkEntry.queries(name)(spark, dir))
    println(f"[explainq] $name warm ${(System.nanoTime() - t1) / 1e9}%.2f s")
    graft.core.Caches.unpersistAll()
    spark.stop()
  }
}
