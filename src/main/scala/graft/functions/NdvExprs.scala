package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Number of leading zero bits of a long — the ρ kernel of the
  * HyperLogLog register update ([[graft.io.NdvSketch]]): after the
  * bucket bits shift out, `numberOfLeadingZeros(w) + 1` is the rank the
  * register keeps the max of. A JVM intrinsic in both eval modes; no
  * SQL builtin computes it (the `floor(log2(w))` double detour is
  * off-by-one near powers of two at 64-bit magnitudes).
  */
case class LongLeadingZeros(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.numberOfLeadingZeros(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Long.numberOfLeadingZeros($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : LongLeadingZeros = copy(child = newChild)
}
