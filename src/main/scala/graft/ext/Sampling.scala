package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — the subsampling / rebalancing step
  * of a training-data pipeline. Everything is hash-derived from stable
  * ids: re-running on the same corpus (or a superset) keeps the same
  * rows, which is what makes incremental corpus builds reproducible.
  * No RNG state, no `sample()` — both are partition-layout dependent.
  */
object Sampling {

  /** Uniform sampling bucket in [0, 10000): basis points of the id's
    * 60-bit hash. A row is kept at fraction f iff bucket < f·10000.
    */
  def bucketBps(id: Column): Column =
    pmod(Dedup.hash60(id.cast("string")), lit(10000)).cast("int")

  /** Per-stratum hash sampling: each stratum keeps its own fraction
    * (basis points), e.g. downsample a dominant language while keeping
    * the tail. Emits every row with its bucket and keep decision so
    * both the kept set and the sampling audit are queryable.
    * Output: id, stratum, bucket, kept.
    */
  def stratifiedSample(df: DataFrame, id: String, stratum: String,
      bps: Map[String, Int], defaultBps: Int): DataFrame = {
    val rate = bps.foldLeft(lit(defaultBps)) { case (acc, (s, r)) =>
      when(col("stratum") === s, lit(r)).otherwise(acc)
    }
    df.select(col(id), col(stratum).as("stratum"),
      bucketBps(col(id)).as("bucket"))
      .withColumn("kept", col("bucket") < rate)
  }

  /** EXACT-size deterministic sample: k rows per stratum, chosen by
    * the id's 60-bit hash order (uniform over the stratum, ties broken
    * by id). Unlike [[stratifiedSample]]'s rate-based buckets —
    * superset-stable but approximate in count — this delivers exactly
    * min(k, |stratum|) rows, the fixed-budget shape (eval slices,
    * per-language quotas). Deterministic across reruns on the same
    * corpus; membership shifts when the population changes (rank-based
    * by construction). Spark plans the rank filter as WindowGroupLimit
    * so each scan task keeps a k-heap before the exchange.
    * Output: id, stratum, sample_rank (1-based) — kept rows only.
    */
  def fixedSizeSample(df: DataFrame, id: String, stratum: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = Window.partitionBy(col("stratum"))
      .orderBy(Dedup.hash60(col(id).cast("string")).asc, col(id).asc)
    df.select(col(id), col(stratum).as("stratum"))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Deterministic train/val/test split — the corpus partition every
    * training run needs: each id's uniform hash bucket (basis points)
    * lands in [0, trainBps) → train, [trainBps, trainBps+valBps) →
    * val, else test. Superset-stable: an id's assignment never changes
    * when other rows are added or removed (no RNG, no rank), which is
    * what keeps eval sets uncontaminated across incremental corpus
    * builds. Scan-local (zero shuffle).
    * Output: id, bucket, split.
    */
  def trainValTestSplit(df: DataFrame, id: String,
      trainBps: Int = 9000, valBps: Int = 500): DataFrame = {
    require(trainBps > 0 && valBps >= 0 && trainBps + valBps < 10000,
      s"invalid split: train=$trainBps val=$valBps")
    df.select(col(id), bucketBps(col(id)).as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainBps, "train")
          .when(col("bucket") < trainBps + valBps, "val")
          .otherwise("test"))
  }

  /** Source mixing to per-source quotas — the rebalancing step that
    * hits a target corpus mixture (e.g. upweight wiki, cap web): each
    * source keeps its quota of rows in the id-hash order (uniform
    * within the source, ties to the smaller id; sources not in the map
    * keep `defaultQuota`). The rank filter first applies the LITERAL
    * max quota so Spark plans WindowGroupLimit — every scan task keeps
    * a max-quota heap before the exchange moves O(sources·maxQuota)
    * rows — then the per-source quota refines post-window.
    * Output: id, source, sample_rank (kept rows only).
    */
  def mixByQuota(df: DataFrame, id: String, source: String,
      quotas: Map[String, Int], defaultQuota: Int = 0): DataFrame = {
    require(quotas.values.forall(_ >= 0) && defaultQuota >= 0,
      "quotas must be non-negative")
    val maxQ = (quotas.values.toSeq :+ defaultQuota).max
    val q = quotas.foldLeft(lit(defaultQuota)) { case (acc, (s, n)) =>
      when(col("source") === s, lit(n)).otherwise(acc)
    }
    val w = Window.partitionBy(col("source"))
      .orderBy(Dedup.hash60(col(id).cast("string")).asc, col(id).asc)
    df.select(col(id), col(source).as("source"))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= maxQ)
      .filter(col("sample_rank") <= q)
  }

  /** Top-k rows per stratum by a metric (desc, ties to the smaller
    * id) — e.g. the k highest-quality documents per language. Spark
    * plans the rank filter as WindowGroupLimit: each partition keeps a
    * running top-k heap BEFORE the shuffle, so the exchange moves
    * O(strata·k) rows, not the corpus.
    * Output: input columns + rank.
    */
  def topKPerStratum(df: DataFrame, id: String, stratum: String,
      metric: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(col(stratum))
      .orderBy(metric.desc, col(id).asc)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
