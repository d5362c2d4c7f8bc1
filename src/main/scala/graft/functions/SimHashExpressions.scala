package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** One-pass SimHash as a native codegen Expression.
  *
  * The HOF formulation (64 separate `aggregate(transform(tokens, …))`
  * passes, one per bit — ops/Dedup.scala round 1) re-hashes every token
  * 64 times and builds a huge codegen unit; this expression tokenizes
  * and hashes each token ONCE, updating all bit counters in a single
  * loop over the raw UTF-8 bytes (no String allocation per token).
  *
  * Tokenization must stay bit-identical to
  * `filter(split(<input>, "\\s+"), t => t != "")`: tokens are maximal
  * runs of non-ASCII-whitespace bytes (Java regex `\s` = space, \t, \n,
  * \x0B, \f, \r). The caller passes the already `lower(trim(…))`-ed
  * column so case/trim semantics remain Spark's own.
  */
abstract class SimHashBase extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs STRING, got ${child.dataType}")
}

/** SimHash over md5-prefix token hashes — engine-portable (same value
  * derivable in DuckDB), oracle-checkable. `bits` ∈ {16, 32}: token
  * hash = first `bits`/4 hex chars of md5 as an integer; output sets
  * bit i when the majority vote over tokens of hash-bit i is positive.
  * Bit-identical to the round-1 HOF formulation (q15 oracle).
  */
case class SimHashMd5(child: Expression, bits: Int) extends SimHashBase {
  override def prettyName: String = "simhash_md5"

  override protected def nullSafeEval(v: Any): Any =
    SimHashKernel.md5Simhash(v.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashKernel.md5Simhash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** 64-bit SimHash over xxhash64(seed=42) token hashes — the production
  * variant (Spark-native hash; not oracle-portable). Bit-identical to
  * the round-1 `xxhash64` HOF formulation.
  */
case class SimHashXx64(child: Expression) extends SimHashBase {
  override def prettyName: String = "simhash_xx64"

  override protected def nullSafeEval(v: Any): Any =
    SimHashKernel.xx64Simhash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashKernel.xx64Simhash($c)")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object SimHashKernel {
  private val tl = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Iterate whitespace-separated token byte-ranges of s, folding each
    * token's hash into the per-bit counters; assemble the sign bits.
    */
  private def fold(s: UTF8String, bits: Int,
      hashToken: (Array[Byte], Int, Int) => Long): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    val counters = new Array[Int](bits)
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        val h = hashToken(bytes, start, i - start)
        var b = 0
        while (b < bits) {
          counters(b) += (((h >>> b) & 1L).toInt << 1) - 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (counters(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  /** Token hash = first `bits`/4 hex chars of md5 (big-endian prefix). */
  def md5Simhash(s: UTF8String, bits: Int): Long = {
    val md = tl.get()
    val prefixBytes = bits / 8 // 16 bits → 2 bytes of the digest
    fold(s, bits, (arr, off, len) => {
      md.reset()
      md.update(arr, off, len)
      val d = md.digest()
      var h = 0L
      var k = 0
      while (k < prefixBytes) { h = (h << 8) | (d(k) & 0xFFL); k += 1 }
      h
    })
  }

  /** Token hash = xxhash64(bytes, seed=42) — Spark's xxhash64 seed. */
  def xx64Simhash(s: UTF8String): Long =
    fold(s, 64, (arr, start, len) =>
      XXH64.hashUnsafeBytes(arr,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start, len, 42L))

  def simhashMd5(c: Column, bits: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      SimHashMd5(org.apache.spark.sql.graftbridge.Bridge.expression(c), bits))

  def simhashXx64(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      SimHashXx64(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}
