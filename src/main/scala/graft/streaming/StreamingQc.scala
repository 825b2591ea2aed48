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

  /** Streaming hopping-window rates — the streaming face of
    * [[graft.ext.Sessionize.hoppingCounts]]: the identical `window()`
    * expression over a watermarked stream, so every event lands in
    * size/slide consecutive windows and a window's count finalizes
    * (append mode) once the watermark passes its end. State is
    * bounded by open windows × dims, not stream length.
    * Output matches the batch operator: w_start_us, w_end_us,
    * dims*, n.
    */
  def hoppingCountsStream(df: DataFrame, eventTimeCol: String,
      size: String, slide: String, dims: Seq[String],
      watermark: String = "2 hours"): DataFrame = {
    val w = window(col(eventTimeCol), size, slide)
    df.withWatermark(eventTimeCol, watermark)
      .groupBy((w.as("__w") +: dims.map(col)): _*)
      .agg(count(lit(1)).as("n"))
      .select((Seq(unix_micros(col("__w.start")).as("w_start_us"),
        unix_micros(col("__w.end")).as("w_end_us")) ++
        dims.map(col) :+ col("n")): _*)
  }

  /** One upsert row for the streaming keep-latest state (public for
    * the encoder).
    */
  final case class UpsertRow(userId: Long, tsUs: Long, eventId: Long,
      value: Double)

  /** Streaming changelog compaction — the streaming face of
    * [[graft.ext.Sessionize.compactLatest]]: ONE state row per key,
    * the (ts, tiebreak)-max row seen so far; each batch re-emits the
    * current latest for every key that received rows (a late arrival
    * that loses to the state re-emits the unchanged winner —
    * Update-mode sink semantics). State is O(keys) regardless of
    * stream length; the comparator matches the batch operator
    * exactly, so after any replay the last emission per key equals
    * the batch compaction — pinned in StreamingSpec.
    */
  def latestStateStream(ds: Dataset[UpsertRow]): Dataset[UpsertRow] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.userId)
      .mapGroupsWithState[UpsertRow, UpsertRow](
        GroupStateTimeout.NoTimeout) {
        (_, rows, state: GroupState[UpsertRow]) =>
          val best = (state.getOption.iterator ++ rows)
            .maxBy(r => (r.tsUs, r.eventId))
          state.update(best)
          best
      }
  }

  /** One telemetry row for the streaming debounce (public for the
    * encoder).
    */
  final case class DebounceRow(key: Long, tsUs: Long, tiebreak: Long)

  /** A debounce decision: the row plus its keep flag. */
  final case class DebounceDecision(key: Long, tsUs: Long,
      tiebreak: Long, kept: Boolean)

  /** Per-key debounce anchor: the timestamp of the last row SEEN
    * (kept or dropped — chained-burst semantics).
    */
  final case class DebounceAnchor(lastTsUs: Long)

  /** Streaming telemetry debounce — the streaming face of
    * [[graft.ext.Sessionize.debounce]] with the same chained-burst
    * contract: a row within toleranceUs of the PREVIOUS ROW (kept or
    * not) is flagged dropped, so only the first row of a burst
    * survives and a long slow drift collapses to its first sample.
    * State is ONE timestamp per key (O(keys), stream-length
    * independent); rows inside a batch are processed in (ts,
    * tiebreak) order, and cross-batch ordering is the replay's
    * responsibility (same contract as the other stateful twins) —
    * StreamingSpec pins equality with the batch operator on an
    * ordered replay, including a burst that spans the batch boundary.
    */
  def debounceStream(ds: Dataset[DebounceRow], toleranceUs: Long)
      : Dataset[DebounceDecision] = {
    import ds.sparkSession.implicits._
    require(toleranceUs >= 0, s"negative tolerance: $toleranceUs")
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[DebounceAnchor, DebounceDecision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[DebounceAnchor]) =>
          val sorted = rows.toSeq.sortBy(r => (r.tsUs, r.tiebreak))
          var last: Option[Long] = state.getOption.map(_.lastTsUs)
          val out = sorted.map { r =>
            val kept = last.forall(l => r.tsUs - l > toleranceUs)
            last = Some(r.tsUs)
            DebounceDecision(key, r.tsUs, r.tiebreak, kept)
          }
          last.foreach(l => state.update(DebounceAnchor(l)))
          out.iterator
      }
  }

  /** Streaming exact dedup over a document stream — the streaming
    * face of `ext.Dedup.exact`: a document whose normalized-text hash
    * was already seen (within the watermark's state-retention bound)
    * is dropped; the first arrival is the keeper. State is keyed by
    * the 128-bit content hash only — bounded by distinct-content
    * volume inside the watermark, not stream length — and expired by
    * `dropDuplicatesWithinWatermark`, which is the only scalable
    * retention policy for an unbounded stream (an unwatermarked
    * dropDuplicates grows state forever).
    * Input needs an event-time column `eventTimeCol`; output is the
    * deduplicated stream with `text_hash` attached.
    */
  def dedupExactStream(df: DataFrame, text: String, eventTimeCol: String,
      watermark: String = "1 hour"): DataFrame =
    df.withColumn("text_hash", graft.ext.Dedup.normHash(col(text)))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("text_hash")

  /** One LSH bucket occupancy event for the streaming near-dup
    * detector (public for the encoder).
    */
  final case class BucketHit(band: Int, key: Long, docId: Long,
      eventTime: java.sql.Timestamp)

  /** Doc ids seen in one (band, key) bucket, plus the newest event
    * time observed for the bucket so the TTL is anchored to the
    * newest event EVER seen, not just the current batch's (public for
    * the state encoder).
    *
    * NOTE: adding `maxEventMs` changed the stateful operator's state
    * schema — a query restarted from a checkpoint written before the
    * change will fail state-schema compatibility and needs a fresh
    * checkpoint (bucket state rebuilds within one TTL horizon).
    */
  final case class BucketState(ids: Array[Long], maxEventMs: Long)

  /** A near-duplicate candidate pair surfaced by a shared bucket. */
  final case class CandidatePair(idA: Long, idB: Long, band: Int)

  /** Streaming MinHash-LSH near-duplicate CANDIDATE detection — the
    * streaming face of `ext.Dedup.minHashLsh` up to (not including)
    * the exact-Jaccard verify tail, which needs both docs' full
    * shingle sets and therefore stays a batch/offline join.
    *
    * Signatures and band keys are the IDENTICAL expressions to the
    * batch operator (Dedup.minHashSigArray — per-row fold, stateless),
    * so batch and stream agree on which bucket a document lands in.
    * State is keyed by (band, bucket key): the doc ids seen in that
    * bucket, capped at `maxBucketSize` (a boilerplate-hot bucket stops
    * accumulating — recall loss on pathological buckets is the
    * documented trade that bounds state; the batch path has no cap.
    * A doc arriving at a full bucket is NOT recorded, so if the same
    * doc id is re-delivered in a later batch it re-emits its candidate
    * pairs — the downstream per-pair dedupe already covers this)
    * and expired by event-time timeout `stateTtl` past the watermark,
    * so total state is bounded by bucket-diversity inside the TTL
    * horizon, not stream length. A pair sharing m bands is emitted m
    * times (once per band) — downstream consumers dedupe or verify;
    * candidates, like the batch operator's, have LSH recall semantics.
    * Input must carry an event-time column already watermarked by the
    * caller.
    */
  def nearDupCandidatesStream(df: DataFrame, id: String, text: String,
      eventTimeCol: String, k: Int = 2, numHashes: Int = 12, bands: Int = 6,
      maxBucketSize: Int = 64, stateTtl: String = "1 hour")
      : Dataset[CandidatePair] = {
    import df.sparkSession.implicits._
    // same single-expression band computation as the batch operator;
    // the watermarked event-time column must survive projection all
    // the way into the stateful operator (event-time timeout tracks it)
    val hits = df.select(col(id).as("__id"), col(eventTimeCol).as("__et"),
        explode(graft.ext.Dedup.minHashBands(col(text), k, numHashes, bands))
          .as("bk"))
      .filter(col("bk.key").isNotNull)
      .select(col("bk.band").as("band"), col("bk.key").as("key"),
        col("__id").as("docId"), col("__et").as("eventTime"))
      .as[BucketHit]
    hits.groupByKey(h => (h.band, h.key))
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bk, events, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prior = state.getOption
            val seen = scala.collection.mutable.ArrayBuffer(
              prior.map(_.ids).getOrElse(Array.empty[Long]): _*)
            val evs = events.toSeq.sortBy(e => (e.eventTime.getTime, e.docId))
            val out = scala.collection.mutable.Buffer.empty[CandidatePair]
            // seed with the stored max so a late batch carrying only
            // older (still-valid) events can't pull the expiry earlier
            // than stateTtl past the newest event already in state
            var maxMs = prior.map(_.maxEventMs).getOrElse(Long.MinValue)
            evs.foreach { e =>
              maxMs = math.max(maxMs, e.eventTime.getTime)
              if (!seen.contains(e.docId)) {
                seen.foreach { o =>
                  out += CandidatePair(math.min(o, e.docId),
                    math.max(o, e.docId), bk._1)
                }
                if (seen.length < maxBucketSize) seen += e.docId
              }
            }
            state.update(BucketState(seen.toArray, maxMs))
            if (maxMs != Long.MinValue)
              state.setTimeoutTimestamp(maxMs, stateTtl)
            out.iterator
          }
      }
  }

  // ---- streaming sessionization ---------------------------------------

  /** Per-event row for the streaming sessionizer: event time kept as a
    * Timestamp so the watermark column survives into the stateful
    * operator.
    */
  final case class UserEvent(userId: Long, ts: java.sql.Timestamp)

  /** A closed session — matches the batch operator's
    * (start_us, end_us, n_events) triple per session.
    */
  final case class SessionWindow(userId: Long, startUs: Long,
      endUs: Long, nEvents: Long)

  /** Open-session state per user (public for the state encoder). */
  final case class SessionState(startUs: Long, endUs: Long, n: Long)

  /** Timestamp → µs without the ms truncation of getTime (the batch
    * twin compares at µs resolution).
    */
  private def usOf(t: java.sql.Timestamp): Long =
    // floorDiv, not /: getNanos is always non-negative, so truncating
    // division would shift pre-epoch timestamps by up to a second
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Streaming gap-based sessionization — the streaming twin of
    * [[graft.ext.Sessionize.sessionize]]. A user's open session closes
    * when (a) an event arrives more than gapUs after the session's
    * end — emitted immediately, the event opens the next session — or
    * (b) the event-time watermark passes end + gap with nothing newer
    * (event-time timeout). State per user: ONE (start, end, n) triple,
    * bounded by user cardinality, not stream length. Events inside the
    * watermark may arrive out of order within a session's gap-envelope
    * (start/end stretch to cover them); ordering violations BEYOND the
    * gap are the batch operator's ground truth, as with [[gapFlags]].
    * Requires `withWatermark` on the event-time column upstream.
    */
  def sessionStream(df: DataFrame, user: String, eventTimeCol: String,
      gapUs: Long): Dataset[SessionWindow] = {
    import df.sparkSession.implicits._
    require(gapUs > 0, s"gapUs must be positive: $gapUs")
    val ev = df.select(col(user).as("userId"), col(eventTimeCol).as("ts"))
      .as[UserEvent]
    ev.groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionWindow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, events, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption
              .map(s => SessionWindow(key, s.startUs, s.endUs, s.n)).iterator
            state.remove()
            out
          } else {
            val sorted = events.map(e => usOf(e.ts)).toSeq.sorted
            val out = scala.collection.mutable.Buffer.empty[SessionWindow]
            var cur = state.getOption
            sorted.foreach { u =>
              cur match {
                case Some(s) if u > s.endUs + gapUs =>
                  out += SessionWindow(key, s.startUs, s.endUs, s.n)
                  cur = Some(SessionState(u, u, 1))
                case Some(s) =>
                  cur = Some(SessionState(math.min(s.startUs, u),
                    math.max(s.endUs, u), s.n + 1))
                case None =>
                  cur = Some(SessionState(u, u, 1))
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                // close at end + gap once the watermark reaches it; a
                // target already behind the watermark must still be
                // strictly ahead of it for setTimeoutTimestamp
                val target = s.endUs / 1000L + gapUs / 1000L + 1L
                state.setTimeoutTimestamp(
                  math.max(target, state.getCurrentWatermarkMs() + 1L))
              case None => state.remove()
            }
            out.iterator
          }
      }
  }

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
  // ---- streaming SentemQC bands ---------------------------------------

  final case class SentemFlag(skey: String, tsUs: Long, flagGlobal: Int,
      isFlagged: Boolean, flagReason: String,
      bandTop: java.lang.Double, bandBottom: java.lang.Double)

  /** Ring buffer of not-yet-finalized points per series (NaN = missing
    * obs). Public for the state encoder.
    */
  final case class SentemState(ts: Array[Long], obs: Array[Double],
      done: Int)

  /** Streaming SentemQC: the 5-run QC-band engine over a stream.
    *
    * The batch engine's windows are CENTERED — each point needs up to
    * max((w−1)/2) future samples — so the streaming form buffers per
    * series until a point's full lookahead has arrived, then emits its
    * flags/band (emit-on-complete; points at the head of the stream
    * wait, points before a shutdown are never finalized — the batch
    * engine remains the replay ground truth). State per series is a
    * bounded window of max(w/2)+max((w−1)/2) (ts, obs) pairs, ~8 KB at
    * the shipped w=960 configs.
    *
    * Late data: the last finalized timestamp is the operator's
    * watermark — later-batch events at/behind it are dropped (their
    * windows were already evaluated; append mode cannot retract), and
    * events ahead of it are merge-sorted into the un-finalized buffer
    * tail so they are evaluated at the correct temporal position. With
    * in-order arrival the output equals the batch engine on every
    * finalized point.
    *
    * Stats replicate the batch operator exactly: finite-count
    * min_periods, interpolated median (run 3), population std,
    * triangular 5-point weighted stats (run 5), support-gated band,
    * pct/constant uncertainty flag logic, nitrate round-trip.
    */
  def sentemFlags(ds: Dataset[SeriesEvent], code: Int,
      cfg: graft.sentem.SentemConfig, isNitrate: Boolean)
      : Dataset[SentemFlag] = {
    import ds.sparkSession.implicits._
    val maxPrec = cfg.runs.map(_.w / 2).max
    val maxFollow = cfg.runs.map(p => (p.w - 1) / 2).max
    ds.groupByKey(_.skey)
      .flatMapGroupsWithState[SentemState, SentemFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, events, state: GroupState[SentemState]) =>
          val prev = state.getOption
            .getOrElse(SentemState(Array.empty, Array.empty, 0))
          // Cross-batch ordering: events at/behind the finalized
          // horizon are DROPPED (their centered windows were already
          // evaluated and emitted — this is the operator's watermark),
          // and the not-yet-finalized buffer tail is merge-sorted with
          // the survivors so late-but-usable events land at their
          // correct temporal position instead of being appended.
          val horizon =
            if (prev.done > 0) prev.ts(prev.done - 1) else Long.MinValue
          val incoming = events.toSeq
            .filter(_.tsUs > horizon)
            .map { e =>
              // pre-mask (≤0 / missing) + nitrate unit conversion
              val raw = if (e.value == null || e.value.doubleValue() <= 0)
                Double.NaN else e.value.doubleValue()
              (e.tsUs, if (isNitrate) raw * (14.0 / 62.0) else raw)
            }
          val tail = (prev.done until prev.ts.length)
            .map(i => (prev.ts(i), prev.obs(i)))
          val merged = (tail ++ incoming).sortBy(_._1)
          val ts = prev.ts.take(prev.done) ++ merged.map(_._1)
          val obs = prev.obs.take(prev.done) ++ merged.map(_._2)
          val n = ts.length
          val emitUpto = math.max(prev.done, n - maxFollow) // exclusive
          // prev.done leading points were emitted by earlier batches
          // (kept only as lookback history) — emit strictly new ones
          val out = (prev.done until emitUpto).map { i =>
            evalPoint(key, code, cfg, isNitrate, ts, obs, i)
          }
          val keepFrom = math.max(0, emitUpto - maxPrec)
          state.update(SentemState(ts.drop(keepFrom), obs.drop(keepFrom),
            emitUpto - keepFrom))
          // NB `evalPoint` indexes the PRE-trim arrays; the emitted
          // prefix always has full history because we never trim past
          // emitUpto - maxPrec.
          out.iterator
      }
  }

  /** Batch-identical per-point SentemQC stats from a contiguous buffer. */
  private def evalPoint(key: String, code: Int,
      cfg: graft.sentem.SentemConfig, isNitrate: Boolean,
      ts: Array[Long], obs: Array[Double], i: Int): SentemFlag = {
    val x = obs(i)
    val finiteX = !x.isNaN
    // sensor-error rules (sentemqc.py:40-50)
    val flagSensor = code match {
      case 157787 | 2477034 | 2477787 => if (finiteX && x < 0) 200 else 100
      case 400 | 400100011 =>
        if (!finiteX) 200
        else if (x == 30 || x == 25 || x == 0 || x >= 40) 200 else 100
      case 410 =>
        if (!finiteX) 200
        else if (x == 0 || x >= 13 || x < 0) 200 else 100
      case _ => 100
    }
    def sliceStats(w: Int, useMedian: Boolean): (Double, Double) = {
      val lo = math.max(0, i - w / 2)
      val hi = math.min(obs.length - 1, i + (w - 1) / 2)
      val fin = (lo to hi).iterator.map(obs).filter(!_.isNaN).toArray
      val minp = graft.sentem.SentemConfig.minPeriods(w)
      if (fin.length < minp) (Double.NaN, Double.NaN)
      else {
        val ma =
          if (useMedian) {
            val s = fin.sorted
            if (s.length % 2 == 1) s(s.length / 2)
            else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
          } else fin.sum / fin.length
        val mean = fin.sum / fin.length
        val sd = math.sqrt(fin.map(v => (v - mean) * (v - mean)).sum / fin.length)
        (ma, sd)
      }
    }
    def tri5(): (Double, Double) = {
      val offs = Seq(-2, -1, 0, 1, 2)
      val wts = Seq(1.0, 2.0, 3.0, 2.0, 1.0)
      val present = offs.zip(wts).flatMap { case (o, wt) =>
        val j = i + o
        if (j >= 0 && j < obs.length && !obs(j).isNaN) Some((obs(j), wt)) else None
      }
      if (present.length < 3) (Double.NaN, Double.NaN)
      else {
        val wsum = present.map(_._2).sum
        val ma = present.map { case (v, wt) => v * wt }.sum / wsum
        val sd = math.sqrt(
          present.map { case (v, wt) => (v - ma) * (v - ma) * wt }.sum / wsum)
        (ma, sd)
      }
    }
    var bandTop: java.lang.Double = null
    var bandBottom: java.lang.Double = null
    // every shipped config gives runs 1 and 2 identical (w, agg) —
    // memoize so the dominant w=960 window folds once per point
    val statCache = scala.collection.mutable.Map.empty[(Int, Boolean), (Double, Double)]
    val runFlags = (1 to 5).map { r =>
      val p = cfg.runs(r - 1)
      val (ma, sd) =
        if (r == 5 && cfg.tri5) tri5()
        else statCache.getOrElseUpdate((p.w, r == 3),
          sliceStats(p.w, useMedian = (r == 3)))
      val top = ma + p.ta + p.sf * sd
      val bot = ma - p.bs - p.sf * sd
      if (r == 5) {
        val lo = math.max(0, i - p.w / 2)
        val hi = math.min(obs.length - 1, i + (p.w - 1) / 2)
        val support = (lo to hi).count(j => !obs(j).isNaN)
        if (support >= graft.sentem.SentemConfig.minPeriods(p.w) && !top.isNaN) {
          val back = if (isNitrate) 62.0 / 14.0 else 1.0
          bandTop = top * back
          bandBottom = bot * back
        }
      }
      // NaN comparisons are false — matches SQL NULL flag semantics (100)
      val viol = (cfg.uncertaintyPct, cfg.uncertaintyCon) match {
        case (Some(u), _) =>
          val tu = (1.0 + u) * x; val bu = (1.0 - u) * x
          (tu > top && bu > top) || (bu < bot && tu < bot)
        case (None, Some(c)) =>
          val tu = x + c; val bu = x - c
          (tu > top && bu > top) || (bu < bot && tu < bot)
        case _ => x > top || x < bot
      }
      if (viol) 200 else 100
    }
    val names = Seq("flag_sensor") ++ (1 to 5).map(r => s"flag_run$r")
    val all = flagSensor +: runFlags
    val flagged = all.contains(200)
    val reason = names.zip(all).collect { case (nm, 200) => nm }.mkString(" ")
    SentemFlag(key, ts(i), if (flagged) 200 else 100, flagged, reason,
      bandTop, bandBottom)
  }

  // ---- streaming WRTDS local2 twin -------------------------------------

  final case class LocalFitEvent(skey: String, tsUs: Long,
      value: java.lang.Double, l2Yhat: java.lang.Double,
      l2Resid: java.lang.Double)

  /** Bounded per-series buffer for [[localFitStream]]: the series time
    * origin, the last finalized timestamp (the late-data horizon —
    * carried EXPLICITLY because a gap longer than the support window
    * can evict every finalized lookback point, and a horizon derived
    * from the buffer would silently reset), the (ts, obs) window
    * (NaN = missing value), and how many leading points were already
    * emitted (kept only as kernel lookback). Public for the state
    * encoder.
    */
  final case class LocalFitState(originUs: Long, horizonUs: Long,
      ts: Array[Long], obs: Array[Double], done: Int)

  /** Streaming twin of [[graft.wrtds.Wrtds.local2]] — the bounded-
    * support incremental WRTDS-proxy kernel: per point, a Gaussian-
    * weighted (half-width `htDays`) linear fit over every finite
    * neighbor within ±`supportDays`, via the exact micro-integer
    * kernel sums of the batch operator.
    *
    * The batch kernel is CENTERED in time — a point needs neighbors up
    * to +supportDays ahead — so the streaming form buffers per series
    * and emits a point once a later event proves its support window
    * closed: finalize i when day(maxSeen) − day(i) > supportDays
    * (strictly; day() is monotone in event time, so no later event can
    * re-enter i's window). Points at the head of the stream wait;
    * points before a shutdown are never finalized — the batch engine
    * remains the replay ground truth (the sentemFlags contract).
    * State per series is the points within supportDays of the HORIZON
    * (the last finalized day — also what an admissible late event's
    * own window can reach back to) plus the unfinalized tail — bounded
    * by the support window times the cadence, never the series length.
    *
    * Late data: the last finalized timestamp is the operator's
    * horizon (carried in state — a support-sized gap can evict every
    * finalized lookback point, and a buffer-derived horizon would
    * reset) — later-batch events at/behind it are dropped, events
    * ahead of it merge-sort into the unfinalized tail. Note the
    * horizon protects EMITTED rows from re-emission, not from
    * retroactive window membership: an out-of-order event landing in
    * (horizon, horizon + supportDays] enters only FUTURE fits, while
    * a batch replay would also include it in already-emitted ones
    * (append mode cannot retract) — with out-of-order input the batch
    * engine remains the ground truth, the sentemFlags contract. Those
    * future fits themselves see the event's full finalized lookback:
    * eviction is anchored at the horizon (not the oldest unfinalized
    * point), so every finalized neighbor an admissible late event can
    * reach is still in state. The
    * series time ORIGIN (day 0) is the series' first event, frozen at
    * first emission; with in-order arrival this is the batch
    * operator's min(ts) and every emitted fit is bit-identical to the
    * batch output (StreamingSpec pins it).
    *
    * Arithmetic mirrors the batch column expressions step for step:
    * day = (us − origin).toDouble / 86400e6; dt = (tj − ti)/htDays;
    * w = exp(−(dt·dt)); the five micro terms halfAway-rounded to the
    * 1e-6 grid as exact longs ([[graft.core.FastRound]]'s equality
    * argument), summed with addExact (the ANSI loud-overflow
    * contract), divided back once; fit emitted when ≥ minp finite
    * neighbors and |denom| > 1e-9, rounded like Spark's round(·, 6).
    * Same precondition as batch: one row per (series, ts).
    */
  def localFitStream(ds: Dataset[SeriesEvent], htDays: Double = 30.0,
      supportDays: Double = 90.0, minp: Int = 10): Dataset[LocalFitEvent] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.skey)
      .flatMapGroupsWithState[LocalFitState, LocalFitEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, events, state: GroupState[LocalFitState]) =>
          val prev = state.getOption
            .getOrElse(LocalFitState(Long.MinValue, Long.MinValue,
              Array.empty, Array.empty, 0))
          val horizon = prev.horizonUs
          val incoming = events.toSeq
            .filter(_.tsUs > horizon)
            .map { e =>
              val v = if (e.value == null) Double.NaN else e.value.doubleValue()
              // a genuine NaN VALUE (not null) is loud in the batch
              // kernel (FastRound's ANSI cast raises on the NaN micro
              // term); silently aliasing it to the internal NaN
              // missing marker would make the stream emit plausible
              // numbers where batch errors — raise the same way
              if (e.value != null && v.isNaN)
                throw new ArithmeticException(
                  s"local2 NaN value at ($key, ${e.tsUs}): the batch " +
                    "kernel raises on NaN micro terms")
              (e.tsUs, v)
            }
          val tail = (prev.done until prev.ts.length)
            .map(i => (prev.ts(i), prev.obs(i)))
          val merged = (tail ++ incoming).sortBy(_._1)
          val ts = prev.ts.take(prev.done) ++ merged.map(_._1)
          val obs = prev.obs.take(prev.done) ++ merged.map(_._2)
          val n = ts.length
          if (n == 0) Iterator.empty
          else {
            // origin freezes at first emission (horizon set); before
            // that the earliest seen event may still improve
            // (out-of-order first batches), after it anything earlier
            // is behind the horizon and dropped above
            val origin =
              if (prev.horizonUs != Long.MinValue) prev.originUs else ts(0)
            val day = ts.map(t => (t - origin).toDouble / 86400e6)
            val maxD = day(n - 1)
            var emitUpto = prev.done
            while (emitUpto < n && maxD - day(emitUpto) > supportDays)
              emitUpto += 1
            val out = (prev.done until emitUpto).map { i =>
              val tiD = day(i)
              var s0 = 0L; var s1 = 0L; var s2 = 0L; var sy = 0L; var sty = 0L
              var cnt = 0L
              var j = 0
              while (j < n) {
                val tjD = day(j)
                if (math.abs(tjD - tiD) <= supportDays && !obs(j).isNaN) {
                  val dt = (tjD - tiD) / htDays
                  val w = math.exp(-(dt * dt))
                  val yj = obs(j)
                  s0 = Math.addExact(s0, micro(w))
                  s1 = Math.addExact(s1, micro(w * tjD))
                  s2 = Math.addExact(s2, micro(w * tjD * tjD))
                  sy = Math.addExact(sy, micro(w * yj))
                  sty = Math.addExact(sty, micro(w * tjD * yj))
                  cnt += 1
                }
                j += 1
              }
              val d0 = s0.toDouble / 1e6; val d1 = s1.toDouble / 1e6
              val d2 = s2.toDouble / 1e6; val dy = sy.toDouble / 1e6
              val dty = sty.toDouble / 1e6
              val denom = d0 * d2 - d1 * d1
              val yi: java.lang.Double =
                if (obs(i).isNaN) null else obs(i)
              if (cnt >= minp && math.abs(denom) > 1e-9) {
                val b1 = (d0 * dty - d1 * dy) / denom
                val b0 = (dy - b1 * d1) / d0
                val yhat = b0 + b1 * tiD
                LocalFitEvent(key, ts(i), yi, round6(yhat),
                  if (yi == null) null else round6(yi.doubleValue() - yhat))
              } else LocalFitEvent(key, ts(i), yi, null, null)
            }
            // evict lookback neither an unfinalized point NOR an
            // admissible late event can reach. The anchor is the
            // HORIZON (last finalized day), not the oldest unfinalized
            // day: a late event is admitted whenever its day exceeds
            // the horizon, and its support window reaches back
            // supportDays from there — anchoring at the (possibly much
            // later, post-gap) oldest unfinalized point evicted
            // finalized neighbors that such an event's own future fit
            // still needs (caught in the round-14 close-out review).
            // horizonD ≤ oldest unfinalized day always, so this keeps
            // a superset of the old retention, still bounded by the
            // support window times the cadence.
            var keepFrom = 0
            while (keepFrom < emitUpto &&
                day(emitUpto - 1) - day(keepFrom) > supportDays)
              keepFrom += 1
            val newHorizon =
              if (emitUpto > 0) ts(emitUpto - 1) else prev.horizonUs
            state.update(LocalFitState(origin, newHorizon,
              ts.drop(keepFrom), obs.drop(keepFrom), emitUpto - keepFrom))
            out.iterator
          }
      }
  }

  /** Exact round-half-away-from-zero to the 1e-6 grid as a long —
    * the driver-side mirror of `FastRound.halfAwayLong(c * lit(1e6))`
    * (floor taken as a LONG before the +1, like Spark's floor→long;
    * non-finite / ≥2^63 raises, the ANSI-cast loud-failure parity).
    */
  private def micro(x: Double): Long = {
    val scaled = x * 1e6
    val a = math.abs(scaled)
    if (!(a < 9.223372036854776e18))
      throw new ArithmeticException(s"local2 micro-term overflow: $x")
    val fd = math.floor(a)
    val rl = fd.toLong + (if (a - fd >= 0.5) 1L else 0L)
    if (scaled < 0) -rl else rl
  }

  /** Mirror of Spark's round(col, 6) on DoubleType: shortest-decimal
    * BigDecimal, HALF_UP, non-finite passed through.
    */
  private def round6(x: Double): java.lang.Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

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
