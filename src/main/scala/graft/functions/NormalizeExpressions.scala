package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen'd expression — the
  * dedup-robustness primitive exact fingerprinting needs: "café" with a
  * precomposed U+00E9 and "café" built from e + combining U+0301 are
  * byte-different (different md5, different MinHash shingles, different
  * exact-dup fingerprints) but render identically, so mirrors /
  * re-encodes of the same page silently evade every hash-based dedup
  * stage. Normalizing to NFC before fingerprinting collapses them;
  * NFKC additionally folds compatibility forms (ligatures ﬁ → fi,
  * full-width Ａ → A) for aggressive matching.
  *
  * One expression call per row, no UDF serialization, stays inside
  * whole-stage codegen like the other graft natives. Two fast paths:
  * pure-ASCII input (the bulk of English web text) is normalized under
  * every form by construction and returns the input UTF8String with
  * zero allocation; otherwise `isNormalized` still returns the input
  * unchanged, at the cost of the one String view the JDK normalizer
  * API forces. The Form enum is resolved once per form name (static
  * table), never per row.
  */
case class UnicodeNormalize(child: org.apache.spark.sql.catalyst.expressions.Expression,
    form: String) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (!UnicodeNormalize.Forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize form must be one of ${UnicodeNormalize.Forms.mkString("/")}, got $form")
    else if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize needs STRING, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  // the Form enum constant, resolved ONCE per expression instance —
  // never a per-row valueOf
  @transient private lazy val resolvedForm = UnicodeNormalize.formFor(form)

  override protected def nullSafeEval(v: Any): Any =
    UnicodeNormalize.normalize(v.asInstanceOf[UTF8String], resolvedForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("nform", resolvedForm,
      "java.text.Normalizer.Form")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnicodeNormalize.normalize($c, $formRef)")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression) =
    copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  // resolved once per form NAME, not per row (enum valueOf is a map
  // lookup with an exception path — wrong thing to pay 10^12 times)
  private[functions] def formFor(form: String): java.text.Normalizer.Form =
    java.text.Normalizer.Form.valueOf(form)

  def normalize(s: UTF8String,
      f: java.text.Normalizer.Form): UTF8String = {
    // ASCII is closed under all four normal forms: nothing to do, and
    // no String copy — the dominant path on English-heavy web corpora
    if (s.isFullAscii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }

  /** String-form convenience (tests, interpreted callers). */
  def normalize(s: UTF8String, form: String): UTF8String =
    normalize(s, formFor(form))

  def apply(c: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      UnicodeNormalize(
        org.apache.spark.sql.graftbridge.Bridge.expression(c), form))
}
