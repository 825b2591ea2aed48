package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Dev utility: sweep every registry query's static physical plan and
  * print the ones containing a BroadcastNestedLoopJoin or
  * CartesianProduct — the input that pins PlanGuardSpec's registry-wide
  * all-pairs allowlist.
  */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = Sessions.local("4")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val hits = df.queryExecution.executedPlan.collect {
          case b: BroadcastNestedLoopJoinExec =>
            // flag the scalar-join idiom so the allowlist can tell a
            // 1-row aggregate broadcast from a genuine all-pairs loop
            val scalarSide = b.children.exists(_.collect {
              case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
                  if a.groupingExpressions.isEmpty => a
            }.nonEmpty)
            s"BNLJ(scalarSide=$scalarSide)"
          case _: CartesianProductExec => "CARTESIAN"
        }
        if (hits.nonEmpty) println(s"SWEEP $name -> ${hits.mkString(", ")}")
        else println(s"SWEEP $name -> clean")
      } catch {
        case e: Throwable => println(s"SWEEP $name -> ERR ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}")
      } finally graft.core.Caches.unpersistAll()
    }
    spark.stop()
  }
}
