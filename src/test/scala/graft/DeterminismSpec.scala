package graft

/** Partitioning-invariance guard: every query's output must be
  * IDENTICAL (value-for-value after a canonical sort) under different
  * shuffle-partition counts — i.e. under different aggregation merge
  * orders, shuffle layouts and task interleavings.
  *
  * This is the local proxy for the driver's cross-environment
  * exact-hash gate and for cluster-layout independence at 100 TB: an
  * operator whose emitted floats depend on double-sum accumulation
  * order will flap here long before it flaps on a 1000-executor
  * layout. Round 8 ran a hand-picked float-tail list (the class that
  * produced the round-7 q_psi_drift/q_source_kl driver hash-fails);
  * round 9 sweeps the FULL registry at sf0.001 — the next float tail
  * is caught automatically, not when someone remembers to add it.
  */
class DeterminismSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  /** The registry, swept in full. No exception list: every query is
    * partition-invariant (k-means/PQ/BPE train on deterministic
    * id-ordered bounded samples included).
    */
  private val targets = SparkEntry.queries.keys.toSeq.sorted

  /** Queries legitimately empty at this SF (the determinism contract
    * still holds — two empty outputs are equal — but the nonEmpty
    * guard is waived). q_binary_switches: sf0.001's event slice has
    * no binary-valued series, so there is no switch to report.
    */
  private val allowedEmpty = Set("q_binary_switches")

  /** Canonical rendering: rows sorted by their full string form.
    * Doubles render via toString — bit-identical doubles render
    * identically, which is the contract under test.
    */
  private def canon(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sfDir)
      .collect()
      .map(r => r.toSeq.map {
        case null => "<NULL>"
        case b: Array[Byte] => b.map("%02x".format(_)).mkString
        case v => v.toString
      }.mkString("|"))
      .sorted
      .toSeq

  for (name <- targets)
    test(s"$name is invariant to the shuffle-partition count") {
      val orig = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        val a = canon(name)
        graft.core.Caches.unpersistAll()
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        val b = canon(name)
        assert(a.nonEmpty || allowedEmpty.contains(name),
          s"$name returned no rows at sf0.001")
        assert(a === b,
          s"$name output depends on the shuffle layout — first diff: " +
            a.zip(b).collectFirst { case (x, y) if x != y => s"$x vs $y" }
              .getOrElse("row-count mismatch"))
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", orig)
        graft.core.Caches.unpersistAll()
      }
    }
}
