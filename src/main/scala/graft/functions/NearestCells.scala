package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native top-`keep` nearest-centroid selection by squared L2 — the
  * coarse-quantizer kernel of [[graft.ext.Similarity.ivfTopK]].
  *
  * Why an Expression: the HOF form (per centroid an
  * `aggregate(zip_with(...))` squared-difference fold inside
  * `transform` → `array_sort` → `slice`) runs the lambda interpreter
  * per centroid per row — on the CORPUS assignment leg that is the
  * ANN serving path's per-row cost, and at cluster scale nlist grows
  * with the corpus. This walks the same centroids in tight primitive
  * loops (one virtual call per row via `ctx.addReferenceObj`).
  *
  * Semantics are EXACTLY the HOF form's (ExtSpec pins the twin):
  *  - d2 = the SAME sequential left fold Σ (xᵢ−cᵢ)² the oracle's
  *    Lloyd replay pins (float→double per element, one product and
  *    one add per step — NOT the ‖c‖²−2·x·c expansion, whose
  *    different rounding could flip an argmin tie against the
  *    oracle);
  *  - selection ascending by (d2, cell) — ties to the lower cell id
  *    (d2 is a sum of squares: never −0.0, and never NaN on finite
  *    input; comparisons use Spark's double total order — NaN
  *    greatest — so even non-finite inputs sort exactly as the HOF
  *    twin's array_sort does);
  *  - a NULL vector, NULL element or length mismatch makes every
  *    fold NULL in the HOF form, where ascending struct order puts
  *    null d2 first and falls through to the cell tiebreak — i.e.
  *    cells 0..keep-1, mirrored here explicitly;
  *  - keep is clamped to nlist (slice past the end returns what
  *    exists). Output: array<int> of cell ids, never NULL.
  */
case class NearestCells(vec: Expression, cents: Array[Array[Double]],
    keep: Int) extends Expression {

  require(cents.nonEmpty && keep >= 1,
    s"graft_nearest_cells needs centroids and keep >= 1 (got ${cents.length}, $keep)")

  override def children: Seq[Expression] = Seq(vec)

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_cells requires array<float|double>, got $other")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_nearest_cells"

  private lazy val isFloat = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val kEff = math.min(keep, cents.length)

  def compute(v: ArrayData): ArrayData = {
    val dim = cents(0).length
    val bad = v == null || v.numElements() != dim || {
      var i = 0; var anyNull = false
      while (i < dim && !anyNull) { anyNull = v.isNullAt(i); i += 1 }
      anyNull
    }
    if (bad) return new GenericArrayData(Array.tabulate(kEff)(identity))
    // hoist the element-type test out of the nlist×dim inner loop — a
    // Scala lazy val accessor pays a volatile read per call
    val f = isFloat
    // top-kEff ascending (d2, cell): insertion into a bounded sorted
    // buffer — nlist is small by construction, keep smaller still.
    // Comparisons use Spark's double TOTAL order (SQLOrderingUtil:
    // NaN greatest, −0.0 = 0.0) so a NaN d2 — unreachable on finite
    // input, but reachable through non-finite embeddings/centroids —
    // sorts exactly where the HOF twin's array_sort puts it instead
    // of freezing into the buffer as an unbeatable entry under
    // primitive-< (where every NaN comparison is false)
    val bestD = new Array[Double](kEff)
    val bestC = new Array[Int](kEff)
    var filled = 0
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var s = 0.0
      var i = 0
      while (i < dim) {
        val x = if (f) v.getFloat(i).toDouble else v.getDouble(i)
        val d = x - cent(i)
        s += d * d
        i += 1
      }
      // strict < against the current worst keeps the earlier (lower)
      // cell on ties, matching the (d2, cell) struct sort
      if (filled < kEff ||
          SQLOrderingUtil.compareDoubles(s, bestD(filled - 1)) < 0) {
        var pos = math.min(filled, kEff - 1)
        while (pos > 0 && SQLOrderingUtil.compareDoubles(bestD(pos - 1), s) > 0) {
          bestD(pos) = bestD(pos - 1); bestC(pos) = bestC(pos - 1)
          pos -= 1
        }
        bestD(pos) = s; bestC(pos) = c
        if (filled < kEff) filled += 1
      }
      c += 1
    }
    // filled == kEff here: every one of the first kEff centroids
    // inserts unconditionally and kEff <= cents.length
    new GenericArrayData(bestC)
  }

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    compute(if (v == null) null else v.asInstanceOf[ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCells", this,
      classOf[NearestCells].getName)
    val v = vec.genCode(ctx)
    ev.copy(
      code = v.code + code"""
        final org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $ref.compute(${v.isNull} ? null : ${v.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NearestCells =
    copy(vec = newChildren(0))

  // never render the centroid matrix into plan text
  override def toString: String =
    s"graft_nearest_cells($vec, nlist=${cents.length}, keep=$keep)"
  override def sql: String = s"graft_nearest_cells(${vec.sql}, $keep)"
}
