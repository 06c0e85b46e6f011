package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{FloatVecDot, LuhnMod30Expr, MinHashSig, SimHashSig, StringHamming}

/** Session extensions: registers the library's native expressions for SQL
  * callers, so `SELECT vec_dot(a.embedding, b.embedding)` and
  * `SELECT minhash_sig(text)` work alongside the Column API. Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FloatVecDot(children(0), children(1))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSig(children.head)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHashSig(children.head)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("hamming"),
      new ExpressionInfo(classOf[StringHamming].getName, "hamming"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        StringHamming(children(0), children(1))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("luhn_mod30"),
      new ExpressionInfo(classOf[LuhnMod30Expr].getName, "luhn_mod30"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LuhnMod30Expr(children.head)))
  }
}
