package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst Unicode normalization (UAX #15) over a string
  * column — the canonical first step of any multilingual text-cleanup
  * pipeline: decomposed sequences (`e` + U+0301) and their precomposed
  * forms (`é`) are distinct byte strings that hash, shingle, SimHash
  * and exact-dedup differently while being canonically the SAME text,
  * so every dedup/fingerprint operator upstream of normalization
  * silently under-merges. NFC/NFD are canonical forms; NFKC/NFKD
  * additionally fold compatibility variants (ligature ﬁ → fi,
  * full-width Ａ → A) — the usual choice before tokenization.
  *
  * Implemented as a codegen'd `UnaryExpression` (not a Scala UDF) so
  * it stays inside whole-stage codegen next to the hash/shingle
  * expressions it feeds; the kernel is `java.text.Normalizer`
  * (ICU-lineage, implements UAX #15 exactly — DuckDB's utf8proc
  * `nfc_normalize` implements the same standard, which is what makes
  * the NFC form exactly oracle-able). A fast pre-check
  * (`Normalizer.isNormalized`) returns the input UTF8String untouched
  * for already-normalized text — the overwhelmingly common case in a
  * real corpus, avoiding the UTF-8 → UTF-16 → UTF-8 round trip.
  *
  * The form is a compile-time literal (one of NFC/NFD/NFKC/NFKD),
  * baked into the generated code as a static field reference.
  */
case class NormalizeUnicode(child: Expression, form: String)
    extends UnaryExpression {

  // Constructor-time guard, not just analysis-time: doGenCode
  // interpolates `form` into generated Java source, so an invalid
  // form must be unrepresentable — any path that codegens the
  // expression without full analysis would otherwise inject an
  // arbitrary string into the generated code.
  require(NormalizeUnicode.Forms.contains(form),
    s"graft_normalize form must be one of NFC|NFD|NFKC|NFKD, got '$form'")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_normalize requires a string column, got ${child.dataType}")
    else if (!NormalizeUnicode.Forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"graft_normalize form must be one of NFC|NFD|NFKC|NFKD, got '$form'")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_normalize"

  // Resolve the enum ONCE per expression instance (transient: the
  // Form enum re-resolves cheaply after executor deserialization) —
  // the per-row valueOf lookup was a string-to-enum scan on the hot
  // path of a whole-stage-codegen'd expression.
  @transient private lazy val resolvedForm: Normalizer.Form =
    Normalizer.Form.valueOf(form)

  override def nullSafeEval(input: Any): Any =
    NormalizeUnicode.normalize(input.asInstanceOf[UTF8String], resolvedForm)

  // The four valid forms are exactly the Normalizer.Form enum constant
  // names (guaranteed by the constructor require), so the generated
  // code references the enum constant statically — no per-row lookup.
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.NormalizeUnicode.normalize($c, java.text.Normalizer.Form.$form);""")

  override protected def withNewChildInternal(
      newChild: Expression): NormalizeUnicode = copy(child = newChild)
}

object NormalizeUnicode {
  private[graft] val Forms = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Static kernel shared by interpreted eval and generated code —
    * takes the resolved enum, so neither path pays a per-row
    * string-to-enum lookup.
    */
  def normalize(s: UTF8String, f: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }
}
