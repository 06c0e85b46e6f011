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

/** Typed per-group HyperLogLog register aggregator — the STATE behind a
  * materialized view's approx-distinct column ([[graft.io.MatView]]):
  * input is the row's xxhash64 (boxed — a NULL input contributes
  * nothing, matching `approx_count_distinct`'s null semantics), the
  * buffer is the 512-byte register array, merge is element-wise max.
  * Registers are bit-identical to [[graft.io.NdvSketch.sketches]]'
  * column form (shared [[graft.io.NdvSketch.update]] kernel).
  */
class HllRegistersAgg
    extends org.apache.spark.sql.expressions.Aggregator[
      java.lang.Long, Array[Byte], Array[Byte]] {

  override def zero: Array[Byte] = new Array[Byte](graft.io.NdvSketch.M)

  override def reduce(b: Array[Byte], h: java.lang.Long): Array[Byte] = {
    if (h != null) graft.io.NdvSketch.update(b, h.longValue)
    b
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    graft.io.NdvSketch.merge(a, b)

  override def finish(b: Array[Byte]): Array[Byte] = b

  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
}

/** Element-wise register max of two HLL sketches — how a view refresh
  * folds an append-only window's per-group registers into the standing
  * state (one scalar call per AFFECTED group, so interpreted eval is
  * fine; codegen delegates to the same static kernel).
  */
case class HllMergeExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.BinaryType

  override def nullSafeEval(a: Any, b: Any): Any =
    graft.io.NdvSketch.merge(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.io.NdvSketch.merge($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HllMergeExpr =
    copy(left = newLeft, right = newRight)
}

/** Finalize HLL registers into the distinct-count estimate — the read
  * side of a view's approx-distinct column.
  */
case class HllEstimateExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    graft.io.NdvSketch.estimate(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.io.NdvSketch.estimate($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : HllEstimateExpr = copy(child = newChild)
}
