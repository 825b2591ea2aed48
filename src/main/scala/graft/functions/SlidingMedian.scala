package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, IntegerType, LongType}

/** Growable primitive double buffer — the aggregation state of
  * [[SlidingMedian]]. Plain array + length, no boxing.
  */
final class DoubleBuf(var arr: Array[Double], var n: Int) {
  def add(v: Double): Unit = {
    if (n == arr.length) {
      val na = new Array[Double](arr.length * 2)
      System.arraycopy(arr, 0, na, 0, n)
      arr = na
    }
    arr(n) = v
    n += 1
  }
}

/** Interpolated exact median as a native imperative aggregate, built
  * for sliding window frames — the fused replacement for the
  * `array_sort(collect_list(value)) → element_at` chain
  * (SeriesWindows.rollingMedian's original form), which was the
  * dominant steady-state cost of the sentem/zscore QC stages: per
  * output row that chain allocates a boxed object array, sorts it
  * with a generic comparator, and probes it twice through ArrayData
  * indirection. This aggregate appends primitives into one growable
  * double array and runs `java.util.Arrays.sort` (dual-pivot on
  * primitives, no boxing) once per evaluation.
  *
  * Semantics are IDENTICAL to the chain it replaces (asserted by
  * RollingSpec's equivalence test): NULL inputs are skipped; with n
  * retained values the result is NULL when n < max(minPeriods, 1)
  * (pandas min_periods counts finite values —
  * scripts/sentemqc.py:26, scripts/ufz_water_qc_pipeline.py:419-420),
  * else (s[(n−1)/2] + s[n/2]) / 2.0 over the sorted values — the
  * numpy/pandas interpolated median (even counts average the middle
  * pair; odd counts hit the same element twice).
  *
  * minPeriods is a construction-time literal, not a child expression:
  * the guard is data-independent, and folding it in here removes the
  * separate `count(value).over(w)` window expression the guarded
  * median otherwise needs.
  */
case class SlidingMedian(child: Expression, minPeriods: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DoubleBuf] with UnaryLike[Expression] {

  // AbstractDataType (and with it ImplicitCastInputTypes) is
  // private[sql], so numeric inputs are checked explicitly; the update
  // path widens per element.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_sliding_median requires a numeric value column, got $t")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sliding_median"

  override def createAggregationBuffer(): DoubleBuf =
    new DoubleBuf(new Array[Double](16), 0)

  override def update(buffer: DoubleBuf, input: InternalRow): DoubleBuf = {
    val v = child.eval(input)
    if (v != null) buffer.add(v match {
      case d: java.lang.Double => d.doubleValue()
      case f: java.lang.Float => f.toDouble
      case i: java.lang.Integer => i.toDouble
      case l: java.lang.Long => l.toDouble
      case other => other.asInstanceOf[Number].doubleValue()
    })
    buffer
  }

  override def merge(buffer: DoubleBuf, other: DoubleBuf): DoubleBuf = {
    var i = 0
    while (i < other.n) { buffer.add(other.arr(i)); i += 1 }
    buffer
  }

  override def eval(buffer: DoubleBuf): Any = {
    val n = buffer.n
    if (n < math.max(minPeriods, 1)) null
    else {
      // In-place sort is safe in every frame mode: sliding frames
      // rebuild the buffer from scratch per output row, and growing
      // frames only append after eval (re-sorted next time).
      java.util.Arrays.sort(buffer.arr, 0, n)
      (buffer.arr((n - 1) / 2) + buffer.arr(n / 2)) / 2.0
    }
  }

  override def serialize(buffer: DoubleBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.n)
    bb.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) { bb.putDouble(buffer.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): DoubleBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val arr = new Array[Double](math.max(n, 16))
    var i = 0
    while (i < n) { arr(i) = bb.getDouble; i += 1 }
    new DoubleBuf(arr, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SlidingMedian =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): SlidingMedian =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): SlidingMedian =
    copy(child = newChild)
}
