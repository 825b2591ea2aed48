package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, BindReferences, CurrentRow, Expression, GenericInternalRow, JoinedRow, Literal, NamedExpression, RowFrame, SortOrder, SpecifiedWindowFrame, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, IntegerType}

import graft.functions.SlidingMedian

/** Planner strategy: a logical `Window` whose window functions are ALL
  * [[graft.functions.SlidingMedian]] aggregates over finite row frames
  * is executed by [[SlidingMedianWindowExec]] instead of the generic
  * `WindowExec`.
  *
  * Why a custom physical operator (SURVEY §7.2 preference (c)):
  * Spark's `SlidingWindowFunctionFrame` RE-AGGREGATES the whole frame
  * for every output row — any aggregate over a w-row sliding frame
  * costs O(w) per row, O(n·w) per series, which is the structural
  * floor under the sentem/zscore median stages (w up to 960 against
  * the golden corpus). A sliding median is incrementally maintainable
  * with two heaps and lazy deletion: O(log w) per row, O(w) memory.
  * That algorithm needs retraction, which Spark's window-frame
  * machinery cannot express — hence a physical operator, not a better
  * aggregate.
  *
  * The exec requires exactly what `WindowExec` requires (clustered by
  * the partition spec, sorted by partition + order spec) and
  * preserves the child's partitioning/ordering, so swapping it in
  * never adds an exchange and downstream window stages keep sharing
  * the series sort. Anything the exec cannot run (unbounded or range
  * frames, mixed window functions, aggregate filters) falls through
  * to the default strategy untouched.
  */
object SlidingMedianStrategy extends SparkStrategy {

  /** Parsed view of one rewritable expression: frame [−before, +after]
    * row offsets and the fused min_periods.
    */
  private[plans] final case class MedianSpec(alias: Alias, valueExpr: Expression,
      before: Int, after: Int, minPeriods: Int)

  private def frameBound(e: Expression): Option[Int] = e match {
    case CurrentRow => Some(0)
    case Literal(v: Int, IntegerType) => Some(v)
    case _ => None
  }

  private[plans] def asMedian(ne: NamedExpression): Option[MedianSpec] = ne match {
    case a @ Alias(WindowExpression(
        AggregateExpression(sm: SlidingMedian, Complete, false, None, _),
        WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame, lo, hi))), _) =>
      // The exec's hot loop reads frame values as unboxed doubles;
      // narrower numeric children (int/long/float — accepted by the
      // aggregate, which widens in update()) fall through to WindowExec
      // rather than ClassCastException inside the exec.
      if (sm.child.dataType != DoubleType) None
      else (frameBound(lo), frameBound(hi)) match {
        case (Some(l), Some(u)) if l <= 0 && u >= 0 =>
          Some(MedianSpec(a, sm.child, -l, u, math.max(sm.minPeriods, 1)))
        case _ => None
      }
    case _ => None
  }

  /** Mixed Window nodes are SPLIT: `CollapseWindow` merges e.g. the
    * sentem median with its same-frame stddev into one logical node —
    * the medians go to the streaming exec and the remaining window
    * functions run in a stacked `WindowExec` above it. The stack adds
    * no exchange or sort: the median exec preserves the child's
    * partitioning/ordering, which already satisfies `WindowExec`'s
    * requirements.
    */
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case logical.Window(windowExprs, partitionSpec, orderSpec, child, _)
        if windowExprs.nonEmpty && orderSpec.nonEmpty =>
      val (medianable, rest) = windowExprs.partition(asMedian(_).isDefined)
      if (medianable.isEmpty) Nil
      else {
        val medianExec = SlidingMedianWindowExec(medianable, partitionSpec,
          orderSpec, planLater(child))
        if (rest.isEmpty) medianExec :: Nil
        else org.apache.spark.sql.execution.window.WindowExec(rest,
          partitionSpec, orderSpec, medianExec) :: Nil
      }
    case _ => Nil
  }
}

/** Streaming sliding-median window operator. Consumes each partition
  * as a (partition-key, order)-sorted row stream; per series keeps a
  * ring buffer of frame values and a two-heap median structure with
  * lazy deletion; emits every input row with the median columns
  * appended once the row's frame upper bound has been consumed (or
  * the series ended). The lookahead buffer holds ≤ max(after)+1 rows,
  * so per-series state is O(frame width), independent of series
  * length.
  *
  * Median semantics are bit-identical to evaluating
  * [[graft.functions.SlidingMedian]] through `WindowExec`
  * (numpy-interpolated middle pair over the frame's non-null values;
  * NULL below min_periods valid values; IEEE total order so a stray
  * NaN ranks largest exactly as in `Arrays.sort`) — asserted
  * bit-for-bit in PlanGuardSpec/RollingSpec.
  */
case class SlidingMedianWindowExec(
    windowExprs: Seq[NamedExpression],
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {

  private lazy val medianSpecs = windowExprs.map(ne =>
    SlidingMedianStrategy.asMedian(ne).getOrElse(
      throw new IllegalStateException(s"not a sliding median: $ne")))

  override def output: Seq[Attribute] =
    child.output ++ windowExprs.map(_.toAttribute)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionSpec.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionSpec) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(partitionSpec.map(SortOrder(_, Ascending)) ++ orderSpec)

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override protected def withNewChildInternal(newChild: SparkPlan): SlidingMedianWindowExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val specs = medianSpecs.map(m =>
      (BindReferences.bindReference(m.valueExpr, childOutput),
        m.before, m.after, m.minPeriods)).toArray
    val partExprs = partitionSpec
    val numMedians = specs.length
    val outputAttrs = output
    val maxAfterG = specs.map(_._3).max

    child.execute().mapPartitions { iter =>
      new Iterator[InternalRow] {
        private val keyProj = UnsafeProjection.create(partExprs, childOutput)
        private val resultProj = UnsafeProjection.create(outputAttrs, outputAttrs)
        private val joined = new JoinedRow
        private val appended = new GenericInternalRow(numMedians)

        // per-series state (reset at every key change)
        private val rows = new java.util.ArrayDeque[UnsafeRow]() // [emitted, arrived)
        private val windows = specs.map { case (_, before, after, _) =>
          // ring span: oldest index still needed for retraction is
          // (emit − before − 1); newest arrived is (emit + maxAfterG)
          new SlidingMedianWindow(before, before + maxAfterG + 2)
        }
        private var arrived = 0L
        private var emitted = 0L
        private var currentKey: UnsafeRow = null
        private var nextSeriesHead: UnsafeRow = null
        private var draining = false

        private def resetSeries(): Unit = {
          arrived = 0L; emitted = 0L; draining = false
          windows.foreach(_.reset())
          rows.clear()
        }

        private def ingest(row: UnsafeRow): Unit = {
          rows.addLast(row)
          var e = 0
          while (e < numMedians) {
            val v = specs(e)._1.eval(row)
            if (v == null) windows(e).arriveNull()
            else windows(e).arrive(v.asInstanceOf[Double])
            e += 1
          }
          arrived += 1
        }

        private def emittable: Boolean =
          emitted < arrived && (arrived - emitted > maxAfterG || draining)

        /** Pull input until a row is emittable or everything is dry. */
        private def advance(): Unit = {
          while (!emittable) {
            if (nextSeriesHead != null) {
              if (emitted < arrived) { draining = true; return }
              resetSeries()
              currentKey = keyProj.apply(nextSeriesHead).copy()
              ingest(nextSeriesHead)
              nextSeriesHead = null
            } else if (iter.hasNext) {
              val r = iter.next().asInstanceOf[UnsafeRow].copy()
              val k = keyProj.apply(r)
              if (currentKey == null) { currentKey = k.copy(); ingest(r) }
              else if (k == currentKey) ingest(r)
              // key change: fall through to the nextSeriesHead branch —
              // with a zero-lookahead frame (after = 0) the buffer can
              // already be fully emitted here, and returning directly
              // would end iteration and DROP every later series in the
              // partition (caught by the multi-series equivalence test)
              else { nextSeriesHead = r; draining = true }
            } else { draining = true; return }
          }
        }

        override def hasNext: Boolean = {
          if (!emittable) advance()
          emittable
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val i = emitted
          val row = rows.pollFirst()
          var e = 0
          while (e < numMedians) {
            val after = specs(e)._3
            windows(e).adjustTo(i, math.min(i + after, arrived - 1))
            if (windows(e).validCount < specs(e)._4) appended.setNullAt(e)
            else appended.update(e, windows(e).median())
            e += 1
          }
          emitted += 1
          resultProj.apply(joined(row, appended))
        }
      }
    }
  }
}

/** Incremental sliding median over an ordered index stream: values
  * arrive in order (arrive/arriveNull), the active frame is moved
  * with adjustTo, and median() reads the interpolated middle pair
  * after O(log w) maintenance. Two primitive binary heaps (max-heap
  * lower half / min-heap upper half) with lazy deletion; comparisons
  * use IEEE total order (java.lang.Double.compare) so NaN ranks
  * exactly as in a sorted array; the lazy-deletion ledger is keyed on
  * canonical double bits so NaN entries match themselves.
  */
private[plans] final class SlidingMedianWindow(before: Int, ringCap: Int) {

  private val ringV = new Array[Double](ringCap)
  private val ringValid = new Array[Boolean](ringCap)
  private var arrivedN = 0L
  private var insertedTo = -1L
  private var deletedTo = -1L

  private val lo = new DHeap(max = true)
  private val hi = new DHeap(max = false)
  // Lazy-deletion ledgers are PER HEAP: with duplicate values at the
  // half boundary, a shared ledger lets a deletion charged to `lo` be
  // physically consumed from `hi`'s copy (observed: live {3,5,7}
  // reporting median 7) — each heap may only drop its own debts.
  private val pendingLo = new java.util.HashMap[java.lang.Long, Integer]()
  private val pendingHi = new java.util.HashMap[java.lang.Long, Integer]()
  private var loValid = 0
  private var hiValid = 0

  def reset(): Unit = {
    arrivedN = 0L; insertedTo = -1L; deletedTo = -1L
    lo.clear(); hi.clear(); pendingLo.clear(); pendingHi.clear()
    loValid = 0; hiValid = 0
  }

  def validCount: Int = loValid + hiValid

  def arrive(v: Double): Unit = {
    val slot = (arrivedN % ringCap).toInt
    ringV(slot) = v; ringValid(slot) = true
    arrivedN += 1
  }

  def arriveNull(): Unit = {
    val slot = (arrivedN % ringCap).toInt
    ringValid(slot) = false
    arrivedN += 1
  }

  /** Bring the heaps to exactly the frame [i − before, frameEnd]. */
  def adjustTo(i: Long, frameEnd: Long): Unit = {
    while (insertedTo < frameEnd) {
      insertedTo += 1
      val slot = (insertedTo % ringCap).toInt
      if (ringValid(slot)) insert(ringV(slot))
    }
    val newDeletedTo = i - before - 1
    while (deletedTo < newDeletedTo) {
      deletedTo += 1
      val slot = (deletedTo % ringCap).toInt
      if (ringValid(slot)) delete(ringV(slot))
    }
  }

  private def cmp(a: Double, b: Double): Int = java.lang.Double.compare(a, b)
  private def bits(v: Double): java.lang.Long = java.lang.Double.doubleToLongBits(v)

  private def insert(v: Double): Unit = {
    pruneLo()
    if (loValid == 0 || cmp(v, lo.top) <= 0) { lo.push(v); loValid += 1 }
    else { hi.push(v); hiValid += 1 }
    rebalance()
  }

  /** Lazy delete: charge the half whose rank range holds a live copy
    * of v. The pre-prune makes lo.top live, so `v ≤ lo.top` implies a
    * live copy is physically in lo (heap max after pruning is live,
    * and all lo values ≤ it), and `v > lo.top` implies every live
    * copy is in hi; the debt is recorded against exactly that heap.
    */
  private def delete(v: Double): Unit = {
    pruneLo()
    if (loValid > 0 && cmp(v, lo.top) <= 0) {
      loValid -= 1
      pendingLo.merge(bits(v), 1, (a: Integer, b: Integer) => a + b)
    } else {
      hiValid -= 1
      pendingHi.merge(bits(v), 1, (a: Integer, b: Integer) => a + b)
    }
    rebalance()
  }

  private def prune(h: DHeap, ledger: java.util.HashMap[java.lang.Long, Integer]): Unit = {
    var go = h.size > 0
    while (go) {
      val k = bits(h.top)
      val c = ledger.get(k)
      if (c == null) go = false
      else {
        if (c == 1) ledger.remove(k) else ledger.put(k, c - 1)
        h.pop()
        go = h.size > 0
      }
    }
  }
  private def pruneLo(): Unit = prune(lo, pendingLo)
  private def pruneHi(): Unit = prune(hi, pendingHi)

  private def rebalance(): Unit = {
    while (loValid > hiValid + 1) {
      pruneLo()
      hi.push(lo.pop()); loValid -= 1; hiValid += 1
    }
    while (hiValid > loValid) {
      pruneHi()
      lo.push(hi.pop()); hiValid -= 1; loValid += 1
    }
  }

  /** Interpolated median of the frame's valid values. Caller must
    * have checked validCount >= min_periods.
    */
  def median(): Double = {
    pruneLo()
    if (loValid > hiValid) {
      val m = lo.top
      (m + m) / 2.0
    } else {
      pruneHi()
      (lo.top + hi.top) / 2.0
    }
  }
}

/** Plain primitive-double binary heap (no boxing). max = true → the
  * top is the largest by IEEE total order; false → the smallest.
  */
private[plans] final class DHeap(max: Boolean) {
  private var arr = new Array[Double](16)
  private var n = 0

  def size: Int = n
  def top: Double = arr(0)
  def clear(): Unit = n = 0

  private def before(a: Double, b: Double): Boolean = {
    val c = java.lang.Double.compare(a, b)
    if (max) c > 0 else c < 0
  }

  def push(v: Double): Unit = {
    if (n == arr.length) {
      val na = new Array[Double](arr.length * 2)
      System.arraycopy(arr, 0, na, 0, n)
      arr = na
    }
    var i = n; n += 1
    arr(i) = v
    while (i > 0 && before(arr(i), arr((i - 1) / 2))) {
      val p = (i - 1) / 2
      val t = arr(i); arr(i) = arr(p); arr(p) = t
      i = p
    }
  }

  def pop(): Double = {
    val r = arr(0)
    n -= 1
    arr(0) = arr(n)
    var i = 0
    var done = n == 0
    while (!done) {
      val l = 2 * i + 1; val r2 = 2 * i + 2
      var b = i
      if (l < n && before(arr(l), arr(b))) b = l
      if (r2 < n && before(arr(r2), arr(b))) b = r2
      if (b == i) done = true
      else { val t = arr(i); arr(i) = arr(b); arr(b) = t; i = b }
    }
    r
  }
}
