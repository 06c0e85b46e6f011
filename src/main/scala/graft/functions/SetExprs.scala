package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-only intersection of two NUMERICALLY SORTED `array<long>`
  * columns — the verification kernel of the exact similarity joins.
  *
  * `size(array_intersect(a, b))` builds a hash set of one side, probes
  * the other, and MATERIALIZES the intersection array, only for `size`
  * to throw it away — per candidate pair, millions of times per join.
  * For sorted fixed-width inputs the same count is one branch-predictable
  * merge walk: O(|a|+|b|) long comparisons, zero allocation. The interned
  * shingle sets ([[ShingleHashes]], [[graft.ops.SimJoin.orderedSets]])
  * are already sorted ascending, so the precondition is free where it
  * matters. UNCHECKED precondition by design — checking would cost the
  * walk itself; callers own the sortedness invariant (both producers
  * sort, and the specs' brute-force equality checks would catch a
  * violation as a wrong count).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // no explicit Seq[AbstractDataType] annotation: the type is
  // private[sql]; inference binds it (the HammingExprs device)
  override def inputTypes = Seq(
    ArrayType(LongType, containsNull = false),
    ArrayType(LongType, containsNull = false))

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedSets.intersectCount(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedSets.intersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedSets {

  /** |a ∩ b| for ascending-sorted distinct long arrays (merge walk). */
  def intersectCount(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

object SetExprs {

  /** Codegen'd count-only sorted-set intersection; both columns must be
    * ascending-sorted distinct `array<long>`.
    */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
