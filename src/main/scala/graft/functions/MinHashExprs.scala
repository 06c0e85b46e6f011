package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signatures as a native expression.
  *
  * The composed pipeline (explode word-3-gram shingles → 2× `md5` per
  * shingle row → groupBy(doc) with 8 `min` aggregates) is semantically the
  * LSH signature, but it materializes ~200 shingle rows per document and
  * pays a full shuffle before the first signature exists — the two slowest
  * bench queries (q_dedup_minhash, q_dedup_fuzzy) both sat on it. At 100 TB
  * that shuffle carries ~200× the corpus through the wire just to compute a
  * per-document value.
  *
  * [[MinHashSig]] instead computes the whole signature in one pass over the
  * text per row: tokenize, walk the 3-gram shingles, hash each once with
  * MD5 (plus the `"x:"+shingle` second digest), and fold the running
  * lexicographic minimum of the four 8-hex-char slices of each digest.
  * Signatures become a map-side scan — the only shuffle left in the LSH
  * pipeline is the band-bucket join itself, which is the part that
  * genuinely needs the cluster.
  *
  * Portability: identical output to the SQL formulation (min over distinct
  * shingles equals min over the multiset, so no dedup pass is needed) and
  * to the DuckDB oracle's `min(substr(md5(...)))`; ASCII-hex compare is the
  * same lexicographic order in both engines. Docs with fewer than 3 tokens
  * yield an EMPTY array (no shingles — same as the exploded form producing
  * no rows; callers filter on `size > 0`).
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinHash.sig(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHash {

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def md5Hex(digest: MessageDigest, s: String): String = {
    val bytes = digest.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** md5 hex of a string's UTF-8 bytes (thread-local digest). */
  def md5HexOf(s: String): String = md5Hex(md.get(), s)

  /** 8-slot signature of `text` (empty array if < 3 tokens); see
    * [[MinHashSig]] for the hash-family construction.
    */
  def sig(text: UTF8String): ArrayData = {
    val digest = md.get()
    val raw = text.toString.split(" ", -1)
    var nTok = 0
    val toks = new Array[String](raw.length)
    var i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) { toks(nTok) = raw(i); nTok += 1 }
      i += 1
    }
    if (nTok < 3) return new GenericArrayData(Array.empty[Any])
    val mins = new Array[String](8)
    var s = 0
    while (s + 2 < nTok) {
      val shingle = toks(s) + " " + toks(s + 1) + " " + toks(s + 2)
      val m1 = md5Hex(digest, shingle)
      val m2 = md5Hex(digest, "x:" + shingle)
      var k = 0
      while (k < 4) {
        val s1 = m1.substring(k * 8, k * 8 + 8)
        if (mins(k) == null || s1.compareTo(mins(k)) < 0) mins(k) = s1
        val s2 = m2.substring(k * 8, k * 8 + 8)
        if (mins(k + 4) == null || s2.compareTo(mins(k + 4)) < 0) mins(k + 4) = s2
        k += 1
      }
      s += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_): Any))
  }
}

/** One-pass 32-bit SimHash as a native expression — same motivation as
  * [[MinHashSig]]: the composed form explodes every token and shuffles all
  * of them into 32 conditional sums per doc; this walks the tokens once
  * per row and votes the bits in place, so the fingerprint is a pure scan.
  * Bit b of token t = MSB of the b-th hex nibble of md5(t) (char ≥ '8');
  * token multiset votes ±1 per bit; sign of each sum is the output bit —
  * byte-identical to the SQL/oracle formulation. Docs with no tokens yield
  * an EMPTY string (the exploded form produced no row; callers filter).
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    SimHash.sig(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHash {

  /** 32-char '1'/'0' fingerprint of `text`; empty if no tokens. */
  def sig(text: UTF8String): UTF8String = {
    val raw = text.toString.split(" ", -1)
    val votes = new Array[Int](32)
    var any = false
    var i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) {
        any = true
        val h = MinHash.md5HexOf(raw(i))
        var b = 0
        while (b < 32) {
          if (h.charAt(b) >= '8') votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    if (!any) return UTF8String.EMPTY_UTF8
    val out = new Array[Char](32)
    var b = 0
    while (b < 32) {
      out(b) = if (votes(b) >= 0) '1' else '0'
      b += 1
    }
    UTF8String.fromString(new String(out))
  }
}

object MinHashExprs {

  /** Codegen'd one-pass MinHash signature of a text column:
    * `array<string>` of 8 8-hex-char slices, empty for sub-3-token docs.
    */
  def minhashSig(text: Column): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(text)))

  /** Codegen'd one-pass 32-bit SimHash of a text column ('1'/'0' chars;
    * empty string for token-less docs).
    */
  def simhashSig(text: Column): Column =
    ColumnBridge.column(SimHashSig(ColumnBridge.expression(text)))
}
