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
  * whole-stage codegen like the other graft natives. The fast path
  * (`isNormalized`) returns the input UTF8String unchanged — on real
  * web corpora the vast majority of text is already NFC, so the common
  * case allocates nothing.
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

  override protected def nullSafeEval(v: Any): Any =
    UnicodeNormalize.normalize(v.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.UnicodeNormalize.normalize($c, "$form")""")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression) =
    copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = java.text.Normalizer.Form.valueOf(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }

  def apply(c: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      UnicodeNormalize(
        org.apache.spark.sql.graftbridge.Bridge.expression(c), form))
}
