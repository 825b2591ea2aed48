package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native two-level (coarse → fine) argmax-cosine seed assignment —
  * the quantizer kernel of [[graft.ext.Similarity.assignCells]].
  *
  * Why an Expression and not the higher-order-function tree it
  * replaces: the HOF form (per candidate `struct(-safeCosine, id)`
  * inside `transform` → `array_min`, twice, plus a literal-map
  * lookup) runs the lambda interpreter with a struct allocation and a
  * boxed `graft_dot` eval per candidate per row — measured ~156 µs/row
  * at 45 candidates (the 64k-row × 512-seed bench shape), which made
  * the assignment, not the pair phase, the SemDeDup bottleneck. This
  * expression walks the same candidates in tight primitive loops (one
  * virtual call per row via `ctx.addReferenceObj`, the
  * BloomFilterMightContain pattern), keeping the surrounding
  * scan→project stage inside whole-stage codegen.
  *
  * Semantics are EXACTLY the HOF form's (ExtSpec pins the twin
  * equality):
  *  - cosine = safeCosine(dot(v, sv), nv·snrm): the same sequential
  *    left fold as graft_dot (float→double widening per element), the
  *    undefined case (zero/negative denominator, NULL input, NULL
  *    element, length mismatch) pinned to −2.0;
  *  - argmax with ties to the smaller seed id (candidate arrays are
  *    id-ascending; the strict `>` keeps the first);
  *  - level 1 over the coarse seeds, level 2 over the winning coarse
  *    cell's fine group — groups indexed by coarse POSITION, built
  *    driver-side in [[graft.ext.Similarity.assignCells]];
  *  - never NULL: a NULL vector scores −2.0 everywhere and lands in
  *    the smallest coarse seed's smallest fine cell, exactly like the
  *    HOF form (and the DuckDB oracle's CASE guard).
  *
  * The seed matrices ride the expression into the task binary (plain
  * serializable arrays, broadcast once per stage); toString is
  * overridden so they never print into plan dumps.
  */
case class NearestSeedCell(vec: Expression, norm: Expression,
    coarseVecs: Array[Array[Float]], coarseNorms: Array[Double],
    fineIds: Array[Array[Long]], fineVecs: Array[Array[Array[Float]]],
    fineNorms: Array[Array[Double]]) extends Expression {

  override def children: Seq[Expression] = Seq(vec, norm)

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, norm.dataType) match {
      case (ArrayType(FloatType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (v, n) => TypeCheckResult.TypeCheckFailure(
        s"graft_nearest_seed requires (array<float>, double), got ($v, $n)")
    }

  override def dataType: DataType = LongType

  override def nullable: Boolean = false

  override def prettyName: String = "graft_nearest_seed"

  /** safeCosine of the row vector against one seed; −2.0 on any
    * undefined case (mirrors `when(den > 0, d/den).otherwise(-2.0)`
    * over a NULL-propagating graft_dot).
    */
  private def cosOf(v: ArrayData, nvNull: Boolean, nv: Double,
      sv: Array[Float], snrm: Double): Double = {
    if (v == null || nvNull) return -2.0
    val n = v.numElements()
    if (n != sv.length) return -2.0
    val den = nv * snrm
    if (!(den > 0)) return -2.0
    var s = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return -2.0
      s += v.getFloat(i).toDouble * sv(i).toDouble
      i += 1
    }
    s / den
  }

  /** Two-level argmax; called from both eval and the generated code.
    * Strict `>` over id-ascending candidates ≡ the HOF form's
    * array_min over (−cos, id) structs (ties → smaller id; ±0.0
    * cosines compare equal in IEEE, matching the 0.0−cos fold that
    * maps both zero signs to +0.0).
    */
  def compute(v: ArrayData, nvNull: Boolean, nv: Double): Long = {
    var bestPos = 0
    var bestCos = Double.NegativeInfinity
    var i = 0
    while (i < coarseVecs.length) {
      val c = cosOf(v, nvNull, nv, coarseVecs(i), coarseNorms(i))
      if (c > bestCos) { bestCos = c; bestPos = i }
      i += 1
    }
    val fv = fineVecs(bestPos)
    val fn = fineNorms(bestPos)
    var bp = 0
    var bc = Double.NegativeInfinity
    var j = 0
    while (j < fv.length) {
      val c = cosOf(v, nvNull, nv, fv(j), fn(j))
      if (c > bc) { bc = c; bp = j }
      j += 1
    }
    fineIds(bestPos)(bp)
  }

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    val nv = norm.eval(input)
    compute(if (v == null) null else v.asInstanceOf[ArrayData],
      nv == null, if (nv == null) 0.0 else nv.asInstanceOf[Double])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestSeed", this,
      classOf[NearestSeedCell].getName)
    val v = vec.genCode(ctx)
    val n = norm.genCode(ctx)
    ev.copy(
      code = v.code + n.code + code"""
        final long ${ev.value} = $ref.compute(
          ${v.isNull} ? null : ${v.value}, ${n.isNull}, ${n.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NearestSeedCell =
    copy(vec = newChildren(0), norm = newChildren(1))

  // never render the seed matrices into plan text
  override def toString: String =
    s"graft_nearest_seed($vec, $norm, nc=${coarseVecs.length})"
  override def sql: String = s"graft_nearest_seed(${vec.sql}, ${norm.sql})"
}
