package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a pre-built Bloom filter — the
  * map-side runtime-filter kernel of
  * [[graft.ext.Dedup.decontaminateBloom]].
  *
  * Why an Expression and not a Scala UDF: the probe sits in the
  * hottest possible place — a filter evaluated once per corpus
  * shingle, BEFORE any exchange — and a row-at-a-time UDF breaks
  * whole-stage codegen for the entire scan→project→filter stage
  * around it. Here the filter object is attached to the generated
  * class as a reference object (`ctx.addReferenceObj`, the same
  * mechanism Spark's own runtime-bloom `BloomFilterMightContain`
  * uses), so the probe compiles to one virtual call inside the fused
  * stage loop and the stage stays `WholeStageCodegen`
  * (PlanGuardSpec pins this).
  *
  * The filter rides the expression into the task binary (a
  * `BloomFilterImpl` is `Serializable`), which Spark broadcasts once
  * per stage — the same shipping cost as an explicit
  * `sparkContext.broadcast`, without a second distribution channel.
  * toString is overridden so a multi-MB bitset never prints into
  * plan dumps (the BENCH_r12 tail lesson: giant plan text is its own
  * failure mode).
  */
case class BloomContains(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains requires a long column, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_contains"

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomContains = copy(child = newChild)

  // never render the bitset into plan text
  override def toString: String = s"graft_bloom_contains($child)"
  override def sql: String = s"graft_bloom_contains(${child.sql})"
}
