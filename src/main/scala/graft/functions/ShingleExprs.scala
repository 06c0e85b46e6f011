package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass DISTINCT word-3-gram shingle hashes as a native expression —
  * the [[MinHashSig]] device applied to the exact-similarity tier.
  *
  * The composed pipeline (tokenize → per-token hash projection → 3-gram
  * combine lambda → array_distinct) is semantically identical, but its
  * projection layering is fragile under CollapseProject/PushDownPredicates:
  * whenever the optimizer inlines the token(-hash) array into a consumer
  * that references it per element, the tokenization re-runs once per
  * SHINGLE and the subplan goes quadratic in document length — measured at
  * sf0.1 this owned 2-6 s of the `q_simjoin_prefix` build depending on
  * which rewrite fired. A single codegen'd expression has no seams for the
  * optimizer to rewrite: tokenize once, hash each token once, combine
  * three fixed-width longs per position, sort + dedup in place.
  *
  * Hashing: XXH64 (Spark's own xxhash64 kernel, seed 42) over each token's
  * UTF-8 bytes, then seed-chained over the three token hashes — the same
  * injective-renaming argument as [[graft.ops.SimJoin.orderedSets]]'s
  * interning: Jaccard over hashed shingles equals Jaccard over string
  * shingles up to ~d²/2⁶⁵ collision probability (≈5e-10 at d = 10⁵
  * distinct shingles corpus-wide). Output is sorted ascending (a
  * by-product of the dedup pass — and a determinism guarantee: equal texts
  * produce byte-equal arrays). Docs with fewer than 3 tokens yield an
  * EMPTY array, mirroring [[MinHashSig]]; callers filter on `size > 0`.
  */
case class ShingleHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  // analysis-time rejection of wrong argument types for the SQL-registered
  // shingle_hashes, consistent with the other injected functions (the
  // inference device of SortedIntersectCount handles the private supertype)
  override def inputTypes = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.distinctHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHash.distinctHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHash {

  /** Spark's xxhash64 default seed — matching it keeps the values in the
    * family a debugging session would expect from `xxhash64(...)`.
    */
  private val Seed = 42L

  /** xxhash64(seed 42) of one token's UTF-8 bytes — shared with the
    * postings bucket router ([[graft.ops.TextOps.tokenBucket]]), which
    * must compute ON THE DRIVER the same bucket the artifact writer
    * computed with the `xxhash64` column function.
    */
  private[graft] def hashToken(t: String): Long = {
    val u = UTF8String.fromString(t)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, Seed)
  }

  /** Sorted distinct 3-gram shingle hashes of `text` (empty if < 3
    * whitespace tokens); see [[ShingleHashes]].
    */
  def distinctHashes(text: UTF8String): ArrayData = {
    val raw = text.toString.split(" ", -1)
    var nTok = 0
    val th = new Array[Long](raw.length)
    var i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) { th(nTok) = hashToken(raw(i)); nTok += 1 }
      i += 1
    }
    if (nTok < 3) return new GenericArrayData(Array.empty[Any])
    val n = nTok - 2
    val hs = new Array[Long](n)
    var s = 0
    while (s < n) {
      // seed-chain the three token hashes, the XXH64 multi-arg idiom
      hs(s) = XXH64.hashLong(th(s + 2),
        XXH64.hashLong(th(s + 1), XXH64.hashLong(th(s), Seed)))
      s += 1
    }
    java.util.Arrays.sort(hs)
    var w = 0
    var r = 1
    while (r < n) {
      if (hs(r) != hs(w)) { w += 1; hs(w) = hs(r) }
      r += 1
    }
    val out = new Array[Any](w + 1)
    var k = 0
    while (k <= w) { out(k) = hs(k); k += 1 }
    new GenericArrayData(out)
  }
}

object ShingleExprs {

  /** Codegen'd one-pass sorted-distinct 3-gram shingle hash set of a text
    * column: `array<long>`, empty for sub-3-token docs.
    */
  def shingleHashes(text: Column): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text)))
}
