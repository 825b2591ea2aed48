package graft.core

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lifecycle registry for DataFrames cached INSIDE operators.
  *
  * Several operators cache an intermediate they fan out over (shingle
  * sets, SimHash fingerprints, the pipeline's cleaned base). The
  * operator cannot unpersist it itself — the returned plan is lazy and
  * still references the cached relation. Leaving them pinned leaks
  * cached blocks across queries in a long-lived session (round-1
  * ADVICE), so every internal cache goes through this registry and the
  * session owner (Bench / Verify / tests / a user's driver) drains it
  * with `unpersistAll()` once the query's actions are done.
  */
object Caches {

  private val live = new ConcurrentLinkedQueue[DataFrame]()

  /** cache() + register for later release. */
  def cached(df: DataFrame): DataFrame = register(df.cache())

  /** persist(level) + register for later release. */
  def persisted(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    register(df.persist(level))

  private def register(df: DataFrame): DataFrame = { live.add(df); df }

  /** Release every registered cache. Safe to call at any point the
    * caller has finished running actions on plans built since the last
    * drain; idempotent.
    *
    * The registry is process-global and assumes ONE query lifecycle at
    * a time (Bench/Verify/tests run queries sequentially): draining
    * while another query's actions are mid-flight would unpersist that
    * query's still-needed caches and silently recompute their whole
    * prefix. Concurrent query execution needs per-query scoping first.
    */
  def unpersistAll(blocking: Boolean = false): Unit = {
    var d = live.poll()
    while (d != null) { d.unpersist(blocking); d = live.poll() }
  }
}
