package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable frequency sketches for the approximate tier (next to HLL
  * `approx_count_distinct` and `percentile_approx` in SURVEY §2.4 A3).
  *
  * [[MisraGries]] is the classic heavy-hitters summary: m counters give
  * every item of true frequency > N/(m+1) a surviving counter, and every
  * reported count lower-bounds the true frequency by at most N/(m+1)
  * (Misra & Gries 1982; merge rule and proof per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012). Counts depend on merge ORDER — two
  * partitionings report different (all valid) lower bounds — so this is
  * deliberately NOT a hash-compared oracle query: `SketchesSpec` proves
  * the mathematical guarantees instead, under adversarial repartitioning,
  * which is the strongest statement a merge-order-dependent sketch admits
  * (same policy as the HLL/percentile sketches).
  */
object Sketches {

  /** Sketch state: parallel arrays (product-encoded — UnsafeRow-native,
    * no kryo), at most `m` live counters; `keys.length == counts.length`.
    */
  final case class MgBuf(keys: Array[String], counts: Array[Long])

  /** Misra-Gries heavy hitters over a string column, capacity m. */
  class MisraGries(m: Int) extends Aggregator[String, MgBuf, Seq[(String, Long)]] {

    def zero: MgBuf = MgBuf(Array.empty, Array.empty)

    def reduce(b: MgBuf, key: String): MgBuf = {
      val i = b.keys.indexOf(key)
      if (i >= 0) { b.counts(i) += 1; b }
      else if (b.keys.length < m)
        MgBuf(b.keys :+ key, b.counts :+ 1L)
      else {
        // decrement-all: every live counter pays one; zeros are evicted.
        // Amortized O(1)/row — each decrement cancels one prior increment.
        var j = 0
        var zeros = 0
        while (j < b.counts.length) {
          b.counts(j) -= 1
          if (b.counts(j) == 0) zeros += 1
          j += 1
        }
        if (zeros == 0) b
        else {
          val keep = b.counts.indices.filter(b.counts(_) > 0)
          MgBuf(keep.map(b.keys).toArray, keep.map(b.counts).toArray)
        }
      }
    }

    def merge(x: MgBuf, y: MgBuf): MgBuf = {
      // sum counters keyed, then subtract the (m+1)-th largest count from
      // every counter and keep the positive ones — the proven MG merge
      val sums = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      x.keys.indices.foreach(i =>
        sums(x.keys(i)) = sums.getOrElse(x.keys(i), 0L) + x.counts(i))
      y.keys.indices.foreach(i =>
        sums(y.keys(i)) = sums.getOrElse(y.keys(i), 0L) + y.counts(i))
      if (sums.size <= m)
        MgBuf(sums.keys.toArray, sums.values.toArray)
      else {
        val sorted = sums.values.toArray.sorted(Ordering[Long].reverse)
        val sub = sorted(m) // (m+1)-th largest
        val kept = sums.iterator.map { case (k, c) => (k, c - sub) }
          .filter(_._2 > 0).toArray
        MgBuf(kept.map(_._1), kept.map(_._2))
      }
    }

    /** Surviving counters, best (largest lower bound) first; ties by key
      * for a stable rendering.
      */
    def finish(b: MgBuf): Seq[(String, Long)] =
      b.keys.indices.map(i => (b.keys(i), b.counts(i)))
        .sortBy { case (k, c) => (-c, k) }

    def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
    def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
