package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen dot product over `array<double>` — the hot kernel
  * under every cosine in the ANN/dedup family (brute-force top-k, LSH
  * buckets and scoring, IVF cell ranking, IVF-PQ ADC, embedding
  * near-dup, SemDeDup, margin mining).
  *
  * The HOF formulation `aggregate(zip_with(a, b, _ * _), 0d, _ + _)`
  * is interpreted: Catalyst evaluates the lambda per element through
  * boxed rows (two allocations + virtual calls per component), and at
  * a 5000×5000 candidate matrix (25M pairs × 64 dims) that interpreter
  * overhead IS the query (q102 min-of-3 measured 16.4 s with the HOF
  * form, 2.0 s with this expression, same harness/window protocol —
  * 8×; the whole 81-query headline dropped 89.4 s → 58.6 s; same move
  * as the SimHash kernel's 101×). This
  * expression compiles to a tight primitive loop over the two
  * ArrayData buffers in whole-stage codegen (and runs the same loop
  * via nullSafeEval when interpreted).
  *
  * Bit-identity contract (the oracle relies on it): accumulation is
  * left-to-right in double — acc = (…((0 + a0·b0) + a1·b1)…) — exactly
  * the HOF fold's order, so every cosine the DuckDB twins recompute
  * via ordered `list_sum` stays bit-identical. Length mismatch throws
  * (the HOF form would yield null via zip_with padding; vectors here
  * are fixed-dim by construction, and silence would hide a real bug).
  * Null ELEMENTS are not handled (cast float→double arrays carry
  * none); null ARRAY inputs yield null via the standard null-safe
  * binary evaluation.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "dot_product"

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<double>, array<double>), got " +
        s"(${left.dataType}, ${right.dataType})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernel.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorKernel {
  /** Left-to-right primitive fold; see [[DotProduct]] for the
    * bit-identity contract.
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"dot_product: length mismatch $n vs ${b.numElements()}")
    var acc = 0.0d
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

object DotProductCol {
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      DotProduct(org.apache.spark.sql.graftbridge.Bridge.expression(a),
        org.apache.spark.sql.graftbridge.Bridge.expression(b)))
}
