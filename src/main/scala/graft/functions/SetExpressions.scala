package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen intersection COUNT over two SORTED-DISTINCT
  * `array<bigint>` — the hot kernel under every hash-set overlap in
  * the dedup family (containment confirm, winnow passage overlap,
  * Jaccard-style recounts over hashed shingle sets).
  *
  * `size(array_intersect(a, b))` pays for generality this call site
  * never uses: array_intersect builds a hash set of one side, probes
  * the other, MATERIALIZES the intersection array — all to be
  * immediately reduced to its size. The dedup sets are produced as
  * `array_sort(collect_set(hash))`, i.e. sorted and distinct by
  * construction, so the count is a single allocation-free two-pointer
  * merge over the primitive long buffers — the same
  * interpreted-vs-primitive gap the [[DotProduct]] kernel closed
  * (measured there at 8×; see its scaladoc for the protocol).
  *
  * CONTRACT: both inputs sorted ascending and duplicate-free —
  * exactly what `array_sort(collect_set(_))` yields. On unsorted
  * input the count is undefined (it would undercount, silently);
  * parity with `size(array_intersect(...))` on the contract inputs is
  * pinned by FunctionsSpec over randomized sets. Null ARRAY inputs
  * yield null via standard null-safe binary evaluation; null elements
  * do not occur (hash columns are non-null by construction).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "sorted_intersect_count"

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<bigint>, array<bigint>), got " +
        s"(${left.dataType}, ${right.dataType})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetKernel.sortedIntersectCount(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SetKernel.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SetKernel {
  /** Two-pointer merge count; see [[SortedIntersectCount]] contract. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1L; i += 1; j += 1 }
    }
    c
  }
}

object SortedIntersectCountCol {
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      SortedIntersectCount(
        org.apache.spark.sql.graftbridge.Bridge.expression(a),
        org.apache.spark.sql.graftbridge.Bridge.expression(b)))
}
