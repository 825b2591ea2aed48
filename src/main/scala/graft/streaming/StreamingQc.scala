package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.core.SeriesSpec

/** Structured-Streaming variants of the QC operators (SURVEY §2.9
  * stretch — the reference is batch-only, but its gap/flat/session
  * logic is sessionization-shaped and ports directly):
  *
  *  - stateless flags (range / missing / sentinel) are ordinary
  *    projections on the stream;
  *  - windowed coverage is a watermarked event-time aggregation;
  *  - gap classification needs the previous event's timestamp — one
  *    long of state per series in flatMapGroupsWithState.
  */
object StreamingQc {

  /** Stateless QC flags — identical expressions to the batch ops. */
  def statelessFlags(df: DataFrame, spec: SeriesSpec,
      rangeMin: Double, rangeMax: Double,
      sentinels: Seq[Double] = Seq(-9.0, -99.0, -999.0, -9999.0)): DataFrame =
    df.withColumn("flag_range",
        coalesce(spec.valueCol < rangeMin || spec.valueCol > rangeMax, lit(false)))
      .withColumn("flag_missing", spec.valueCol.isNull)
      .withColumn("flag_sentinel",
        coalesce(spec.valueCol.isin(sentinels: _*), lit(false)))

  /** Watermarked tumbling-window coverage: per (series, window) count
    * of observed vs finite samples — the streaming face of
    * seasonal/coverage statistics.
    */
  def windowedCoverage(df: DataFrame, spec: SeriesSpec,
      windowDur: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    df.withWatermark(spec.ts, watermark)
      .groupBy((spec.keyCols :+ window(spec.tsCol, windowDur).as("win")): _*)
      .agg(count(lit(1)).as("n_obs"), count(spec.valueCol).as("n_finite"))
      .select((spec.keyCols :+ col("win.start").as("window_start") :+
        col("n_obs") :+ col("n_finite")): _*)

  /** Per-event row for the stateful gap detector. */
  final case class SeriesEvent(skey: String, tsUs: Long, value: java.lang.Double)

  /** A completed constant-value run emitted by the streaming
    * detector.
    */
  final case class RunEvent(skey: String, startUs: Long, endUs: Long,
      n: Int, value: Double)

  /** State carried per series by flatRunEvents (public: Spark codegen
    * needs constructor access for the state encoder).
    */
  final case class RunState(startUs: Long, endUs: Long,
      value: Double, n: Int)

  /** Streaming TRUE-run flat-value detector: a run is a maximal span
    * of equal consecutive values; it is emitted when the value
    * changes (or goes missing) and it spans ≥ minHours with ≥ 2
    * samples. State per series: one (start, end, value, count)
    * tuple, carried across microbatches. This is the streaming-native
    * semantics — the batch operator keeps the reference's pseudo-RLE
    * for golden parity.
    */
  def flatRunEvents(ds: Dataset[SeriesEvent], minHours: Double = 2.0)
      : Dataset[RunEvent] = {
    import ds.sparkSession.implicits._
    val minUs = (minHours * 3600 * 1e6).toLong
    ds.groupByKey(_.skey)
      .flatMapGroupsWithState[RunState, RunEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, events, state: GroupState[RunState]) =>
          val sorted = events.toSeq.sortBy(_.tsUs)
          var cur: Option[RunState] = state.getOption
          val out = scala.collection.mutable.Buffer.empty[RunEvent]
          def close(): Unit = cur.foreach { r =>
            if (r.n >= 2 && r.endUs - r.startUs >= minUs)
              out += RunEvent(key, r.startUs, r.endUs, r.n, r.value)
          }
          sorted.foreach { e =>
            cur match {
              case Some(r) if e.value != null && e.value.doubleValue() == r.value =>
                cur = Some(r.copy(endUs = e.tsUs, n = r.n + 1))
              case _ =>
                close()
                cur = Option(e.value).map(v =>
                  RunState(e.tsUs, e.tsUs, v.doubleValue(), 1))
            }
          }
          cur match {
            case Some(r) => state.update(r)
            case None => state.remove()
          }
          out.iterator
      }
  }
  final case class GapFlagged(skey: String, tsUs: Long, value: java.lang.Double,
      isGap: Boolean, gapUs: java.lang.Long)

  /** Streaming gap classification: flags an event whose delta to the
    * previous event of its series exceeds gapHours (the reference's
    * first-post-gap-sample semantics, classify_gaps). State per
    * series: last seen event-time (one long). Events are assumed
    * in-order per series within a microbatch (sorted inside the
    * group iterator) and across batches by arrival — the batch
    * operator remains the ground truth for out-of-order replays.
    */
  def gapFlags(ds: Dataset[SeriesEvent], gapHours: Double = 2.0)
      : Dataset[GapFlagged] = {
    import ds.sparkSession.implicits._
    val thr = (gapHours * 3600 * 1e6).toLong
    ds.groupByKey(_.skey)
      .flatMapGroupsWithState[Long, GapFlagged](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, events, state: GroupState[Long]) =>
          val sorted = events.toSeq.sortBy(_.tsUs)
          var last = if (state.exists) state.get else Long.MinValue
          val out = sorted.map { e =>
            val delta = if (last == Long.MinValue) -1L else e.tsUs - last
            val isGap = delta >= 0 && delta > thr
            last = math.max(last, e.tsUs)
            GapFlagged(key, e.tsUs,
              if (isGap) null else e.value, // mask first post-gap sample
              isGap, if (isGap) java.lang.Long.valueOf(delta) else null)
          }
          if (sorted.nonEmpty) state.update(last)
          out.iterator
      }
  }
}
