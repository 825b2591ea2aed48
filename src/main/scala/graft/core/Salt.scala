package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew-salting: two-stage aggregation for pathological hot keys.
  *
  * A `groupBy(hotKey)` shuffles every row of a hot key to ONE reducer;
  * at 100 TB a single key holding 10% of the data serializes 10 TB
  * through one task. Salting splits each key into `nSalts` sub-groups
  * aggregated independently (stage 1 — the hot key now spreads over
  * nSalts reducers and map-side combine shrinks the shuffle), then
  * merges the ≤ nSalts partial rows per key (stage 2 — tiny).
  *
  * Only works for algebraic aggregates (re-aggregatable partials):
  * count, sum, min, max and anything derivable from them (avg =
  * sum/count). Order statistics (exact median) cannot be salted this
  * way. AQE's skew-join handling covers JOIN skew at runtime; this is
  * the aggregation-side tool.
  */
object Salt {

  /** Deterministic salt in [0, nSalts) derived from a row-level column
    * (pick one that varies within the hot key, e.g. the timestamp).
    */
  def saltFrom(c: Column, nSalts: Int): Column =
    pmod(abs(hash(c)), lit(nSalts))

  /** Per-key count / exact sum / min / max via salted two-stage
    * aggregation. The sum goes through `round(x, 3)` cast to
    * DECIMAL(30,3) — exact and order-free, so the salted result is
    * bit-identical to the direct single-stage groupBy (a double sum
    * would differ by summation order between the two shapes).
    * Output: keys*, n, sum_val, min_val, max_val.
    */
  def skewAgg(df: DataFrame, keys: Seq[String], valueCol: Column,
      saltOn: Column, nSalts: Int = 32): DataFrame = {
    val dec = round(valueCol, 3).cast(DecimalType(30, 3))
    val keyCols = keys.map(col)
    val partial = df
      .withColumn("__salt", saltFrom(saltOn, nSalts))
      .groupBy((keyCols :+ col("__salt")): _*)
      .agg(count(valueCol).as("__n"), sum(dec).as("__s"),
        min(valueCol).as("__mn"), max(valueCol).as("__mx"))
    partial.groupBy(keyCols: _*)
      .agg(sum(col("__n")).as("n"),
        sum(col("__s")).cast("double").as("sum_val"),
        min(col("__mn")).as("min_val"),
        max(col("__mx")).as("max_val"))
  }

  /** Salted replicated JOIN for a skewed equi-join key — the join-side
    * twin of [[skewAgg]]. The BIG side gets a row-level salt; the
    * SMALL side is replicated nSalts× (one explode); the join runs on
    * (keys, salt), so a hot key's rows spread over nSalts reducers
    * instead of serializing through one. The row set is identical to
    * the plain inner equi-join: every big row matches exactly the one
    * replica carrying its salt. Use when the small side is too large
    * to broadcast but cheap to replicate nSalts×, and AQE's runtime
    * skew split doesn't apply (e.g. the partitioning is pinned by an
    * upstream stage or the skew is in a single unsplittable key
    * group). `small` must not already contain a `__salt` column.
    */
  def skewJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltOn: Column, nSalts: Int = 32): DataFrame = {
    require(nSalts > 0, s"nSalts must be positive: $nSalts")
    val salted = big.withColumn("__salt", saltFrom(saltOn, nSalts))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
