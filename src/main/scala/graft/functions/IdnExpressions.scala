package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Punycode/IDN host decoding (RFC 3490 ToUnicode, `java.net.IDN`) as
  * a native codegen'd expression — the internationalized-domain
  * primitive host-level curation needs at web scale: the wire form of
  * a non-ASCII domain is its ACE encoding ("xn--mnchen-3ya.example.com"),
  * so host matching, per-domain stats and blocklists that only see the
  * ACE bytes silently treat "münchen.example.com" and its punycode
  * spelling as different hosts, and homograph lookalikes
  * ("xn--pple-43d.com" → "аpple.com", Cyrillic а) are invisible until
  * decoded. Decode once, then match/flag on the Unicode form (see
  * [[graft.ops.Curation.mixedScriptHost]] for the confusable-script
  * flag).
  *
  * Per the RFC, ToUnicode never fails — a label that is not valid
  * punycode stays as-is — and ASCII hosts without an "xn--" label
  * return the input UTF8String unallocated (the dominant path; the
  * substring probe is a byte scan, no String materialized). A
  * defensive catch still returns the input on any JDK exception so a
  * hostile host string can never fail a 10^12-row scan.
  *
  * One expression call per row, no UDF serialization, stays inside
  * whole-stage codegen like the other graft natives.
  */
case class IdnToUnicode(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"idn_to_unicode needs STRING, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(v: Any): Any =
    IdnToUnicode.decode(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.IdnToUnicode.decode($c)")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression) =
    copy(child = newChild)
}

object IdnToUnicode {
  private val AcePrefix = UTF8String.fromString("xn--")

  def decode(s: UTF8String): UTF8String = {
    // fast path: no ACE label anywhere -> nothing to decode, zero
    // allocation (covers every plain-ASCII and already-Unicode host)
    if (!s.contains(AcePrefix)) return s
    try {
      val out = java.net.IDN.toUnicode(s.toString)
      UTF8String.fromString(out)
    } catch {
      case _: RuntimeException => s // hostile input: keep wire form
    }
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      IdnToUnicode(
        org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}
