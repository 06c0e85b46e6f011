package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for float-vector dot products.
  *
  * The composed form (`zip_with` + `aggregate`, SURVEY.md §2.8 F4) is
  * semantically right but interpreted per element — ~16 µs/pair over the
  * 64-dim embeddings at bench scale (2M pairs ⇒ 32 s, the single slowest
  * query). This expression participates in whole-stage codegen: one tight
  * primitive `for` loop per pair, no lambda dispatch, no boxing, no
  * intermediate array. Accumulation order is the same sequential
  * left-to-right fold as both the HOF formulation and DuckDB's `list_sum`,
  * so oracle results are bit-identical (SURVEY.md §4.3 upgrade criterion:
  * only replace a built-in composition when the bench shows the gap —
  * it did).
  *
  * Elements are assumed non-null (parquet `list<float>` with required
  * elements, FIXTURES.md); null *vectors* yield null via BinaryExpression's
  * null-intolerant contract.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {

  /** Codegen'd dot product of two `array<float>` columns, in double. */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatVecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
