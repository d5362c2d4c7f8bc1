package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions with whole-stage codegen (`doGenCode`) —
  * the §2.10 tier between built-in functions and UDFs. Both are used on
  * hot validation/dedup paths where the regex/HOF equivalents are
  * measurably slower and allocate.
  */

/** Strict ISIN shape check: `[A-Z]{2}[A-Z0-9]{9}[0-9]` plus the ISO 6166
  * Luhn check digit (docs/rule_2.txt:427-431 specifies the shape; the
  * checksum is the public standard's validation).
  */
case class IsinValid(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"isin_valid needs STRING, got ${child.dataType}")

  override protected def nullSafeEval(v: Any): Any =
    IsinValid.check(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.IsinValid.check($c.toString())")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object IsinValid {
  /** Shape + Luhn double-add-double over the digit expansion. */
  def check(s: String): Boolean = {
    if (s == null || s.length != 12) return false
    var i = 0
    while (i < 12) {
      val c = s.charAt(i)
      val ok =
        if (i < 2) c >= 'A' && c <= 'Z'
        else if (i == 11) c >= '0' && c <= '9'
        else (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
      if (!ok) return false
      i += 1
    }
    // expand letters to two digits (A=10..Z=35), then Luhn from the right
    val digits = new java.lang.StringBuilder(24)
    i = 0
    while (i < 12) {
      val c = s.charAt(i)
      if (c >= 'A' && c <= 'Z') digits.append(c - 'A' + 10)
      else digits.append(c)
      i += 1
    }
    // standard Luhn: from the rightmost digit (k=0, not doubled),
    // double every second digit, subtract 9 when > 9
    var sum = 0
    var idx = digits.length - 1
    var k = 0
    while (idx >= 0) {
      var d = digits.charAt(idx) - '0'
      if (k % 2 == 1) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      idx -= 1; k += 1
    }
    sum % 10 == 0
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      IsinValid(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** xxhash64-free portable token hash: first 8 hex chars of MD5 as long —
  * the same arithmetic as Dedup.tokHash, but as ONE codegen'd expression
  * instead of conv(substring(md5(...))) (three allocations per token).
  */
case class Md5Prefix32(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"md5_prefix32 needs STRING, got ${child.dataType}")

  override protected def nullSafeEval(v: Any): Any =
    Md5Prefix32.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Prefix32.hash($c)")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object Md5Prefix32 {
  private val tl = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def hash(s: UTF8String): Long = {
    val md = tl.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // first 4 bytes big-endian = first 8 hex chars as unsigned 32-bit
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      Md5Prefix32(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** SQL registration for both expressions. */
object GraftFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "isin_valid", exprs => IsinValid(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_prefix32", exprs => Md5Prefix32(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash16", exprs => SimHashMd5(exprs.head, 16), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHashXx64(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc", exprs => UnicodeNormalize(exprs.head, "NFC"), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfkc", exprs => UnicodeNormalize(exprs.head, "NFKC"), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "idn_to_unicode", exprs => IdnToUnicode(exprs.head), "scala_udf")
  }
}
