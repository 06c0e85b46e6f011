package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared Luhn mod-30 kernel (OpenMRS idgen check digit, SURVEY.md §2.2
  * P9) — ONE implementation used by the interpreted eval, the generated
  * code (via the static forwarder `LuhnMod30Fn.compute`), and — through
  * [[graft.etl.Migration.luhnMod30]] — the legacy UDF that the specs keep
  * as a cross-check.
  */
object LuhnMod30Fn {

  val Chars = "0123456789ACDEFGHJKLMNPRTUVWXY"

  /** UTF8String→UTF8String form the generated code calls directly — no
    * boxing, no encoder round-trip. Null for out-of-alphabet input, like
    * [[computeString]].
    */
  def compute(id: UTF8String): UTF8String = {
    val s = computeString(id.toString)
    if (s == null) null else UTF8String.fromString(s)
  }

  /** Check digit, or NULL when `id` contains a character outside the
    * mod-30 alphabet (B, I, O, Q, S, Z, punctuation, …). The legacy
    * behavior mapped such characters to `indexOf = -1` and silently
    * emitted a garbage digit — tolerable for the internal migration path
    * whose inputs are numeric keys, but the SQL-registered `luhn_mod30`
    * widened the surface, so invalid input now follows the null contract
    * (round-10 ADVICE) and a caller can catch it with a null check
    * instead of shipping an undetectable bad identifier.
    */
  def computeString(id: String): String = {
    var sum = 0
    var factor = 2
    var i = id.length - 1
    while (i >= 0) {
      val v = Chars.indexOf(id.charAt(i).toUpper)
      if (v < 0) return null
      val add = v * factor
      sum += (if (factor == 2) add / 30 + add % 30 else add)
      factor = if (factor == 2) 1 else 2
      i -= 1
    }
    Chars.charAt((30 - sum % 30) % 30).toString
  }
}

/** Codegen'd Luhn mod-30 check digit (round-8 VERDICT stretch): replaces
  * the Scala UDF in the hot identifier paths. A UDF exits whole-stage
  * codegen through an encoder boundary (UTF8String → String → lambda →
  * String → UTF8String, one closure dispatch per row); this expression
  * stays inside the generated stage and calls the shared kernel through a
  * static forwarder — the same pattern Spark's own string intrinsics use.
  * Null in → null out via UnaryExpression's null-intolerant contract;
  * out-of-alphabet input → null too (see [[LuhnMod30Fn.computeString]]),
  * so the SQL surface cannot silently mint invalid identifiers.
  */
case class LuhnMod30Expr(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {

  override def dataType: DataType = StringType

  override def inputTypes = Seq(StringType)

  // null for out-of-alphabet input (not only for null input)
  override def nullable: Boolean = true

  override def nullSafeEval(s: Any): Any =
    LuhnMod30Fn.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.LuhnMod30Fn.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(
      newChild: Expression): LuhnMod30Expr = copy(child = newChild)
}

object LuhnExprs {

  /** Codegen'd Luhn mod-30 check digit of a string column. */
  def luhnMod30(c: Column): Column =
    ColumnBridge.column(LuhnMod30Expr(ColumnBridge.expression(c)))
}
