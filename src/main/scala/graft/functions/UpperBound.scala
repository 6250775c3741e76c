package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: `graft_ubound(v, boundaries)` = the number of
  * elements of the CONSTANT `array<double>` that are <= `v` — i.e. the
  * quantile-bucket index of `v` against pre-computed split points.
  *
  * The built-in spelling, `aggregate(lit(bounds), 0L, (acc, b) ->
  * acc + if(v >= b, 1, 0))`, is an interpreted higher-order fold: 255
  * closure calls + boxing per row per evaluation, outside whole-stage
  * codegen — and z-value interleaving ([[graft.operators.Scale.zorderBy]])
  * references each bucket index once per bit, so the fold ran 8× per
  * dimension per row, then again in the range-partitioner's sampling pass.
  * This expression is one codegen'd O(log n) binary search over a static
  * `double[]`, and identical subexpressions are eliminated within the
  * projection, so each bucket index is computed once per row.
  *
  * Exact-match contract with the fold it replaces (count of b <= v over the
  * multiset, order-invariant): the boundary array is sorted once at plan
  * time (a no-op for approx_percentile output), duplicates are counted via
  * an upper-bound search, a NULL `v` propagates NULL (callers coalesce to
  * bucket 0 exactly as `when(null >= b, ...)` folded to 0), and a NaN `v`
  * counts every boundary — Spark's ordering puts NaN above all doubles,
  * unlike Java's `>=`. NaN boundaries (none survive zorderBy's filter) sort
  * to the array's tail where the search's `<= v` test already excludes them.
  */
case class DoubleUpperBound(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val okBounds = right.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (left.dataType != DoubleType || !okBounds)
      TypeCheckResult.TypeCheckFailure(
        s"graft_ubound requires (double, array<double>), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_ubound requires a constant (foldable) boundary array")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ubound"

  @transient private lazy val bounds: Array[Double] = {
    val ad = right.eval().asInstanceOf[ArrayData]
    val a = Array.tabulate(ad.numElements())(ad.getDouble)
    java.util.Arrays.sort(a) // count(b <= v) is order-invariant; search isn't
    a
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    UpperBoundSearch.count(bounds, a.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val arr = ctx.addReferenceObj("bounds", bounds, "double[]")
      s"${ev.value} = graft.functions.UpperBoundSearch.count($arr, $v);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleUpperBound =
    copy(left = newLeft, right = newRight)
}

/** Shared by interpreted eval and generated code. */
object UpperBoundSearch {
  /** Elements of sorted `a` that are <= `v` under SPARK double ordering
    * (NaN greater than everything, so a NaN probe counts all elements;
    * NaN array entries sit at the sorted tail and never satisfy `<= v`
    * for a non-NaN probe). */
  def count(a: Array[Double], v: Double): Long = {
    if (java.lang.Double.isNaN(v)) return a.length.toLong
    var lo = 0
    var hi = a.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }
}
