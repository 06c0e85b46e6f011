package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared byte-wise Hamming kernel: differing positions over the common
  * prefix (min length). The perceptual-hash strings it serves are fixed
  * 64-char ASCII bit strings, so byte compare == char compare; the
  * min-length convention matches the `zip_with` composition it replaced
  * (whose null-padded tail positions never counted).
  */
object HammingFn {
  def hamming(a: UTF8String, b: UTF8String): Long = {
    val n = math.min(a.numBytes(), b.numBytes())
    var d = 0L
    var i = 0
    while (i < n) {
      if (a.getByte(i) != b.getByte(i)) d += 1L
      i += 1
    }
    d
  }
}

/** Codegen'd string Hamming distance. The composed form
  * (`size(filter(zip_with(split(a,""), split(b,""), ≠), id))`) allocates
  * two 64-element arrays and dispatches two lambdas per candidate pair —
  * interpreted, off the codegen path. This expression stays inside the
  * generated stage and calls the kernel through a static forwarder (the
  * [[LuhnMod30Expr]] pattern). Null-intolerant: null in → null out.
  */
case class StringHamming(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType

  // declared input types turn `hamming(1, 2)` into an AnalysisException
  // with implicit-cast support instead of a ClassCastException at
  // execution (round-10 ADVICE)
  override def inputTypes = Seq(StringType, StringType)

  override def nullSafeEval(a: Any, b: Any): Any =
    HammingFn.hamming(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HammingFn.hamming($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StringHamming =
    copy(left = newLeft, right = newRight)
}

object HammingExprs {

  /** Codegen'd Hamming distance between two string columns, as long. */
  def hamming(a: Column, b: Column): Column =
    ColumnBridge.column(
      StringHamming(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
