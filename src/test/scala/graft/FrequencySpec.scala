package graft

import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters ([[graft.ops.Frequency]]): the DuckDB
  * oracle proves the sf values; this suite drives the sketch through
  * EVICTION (the sf corpus has ~31 distinct tokens against 64 slots, so
  * the decrement path never fires there) and checks the completeness
  * theorem on a corpus built to stress it.
  */
class FrequencySpec extends TestSpark {

  test("sketch-then-verify equals brute force under heavy eviction") {
    import spark.implicits._
    // 5 heavy tokens (well above n/(k+1)) drowned in 400 distinct rare
    // tokens — 405 distinct >> 64 slots, so partials evict constantly
    val heavy = (0 until 5).flatMap(h => Seq.fill(500)(s"heavy_$h"))
    val rare = (0 until 400).flatMap(r => Seq.fill(3)(s"rare_$r"))
    val toks = new scala.util.Random(42).shuffle(heavy ++ rare)
    val df = toks.toDF("tok")
    val k = 64
    val got = graft.ops.Frequency.heavyHitters(df, k, 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = toks.size.toLong
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (k + 1) > n }
      .toSeq.map { case (t, c) => (t, c) }
      .sortBy { case (t, c) => (-c, t) }.take(10)
    assert(got.toSeq === exact)
    assert(got.map(_._1).toSet === (0 until 5).map(h => s"heavy_$h").toSet,
      "every provably-heavy token must survive eviction (MG recall)")
  }

  test("merge preserves the undercount bound across partition layouts") {
    import spark.implicits._
    // same multiset, adversarial partitioning: all heavies in ONE
    // partition, rares spread — merged summary must still retain them
    val heavy = Seq.fill(300)("H")
    val rare = (0 until 300).map(r => s"r_$r")
    val df = (heavy ++ rare).toDF("tok").repartition(16)
    val got = graft.ops.Frequency.heavyHitters(df, 64, 10)
      .collect().map(_.getString(0))
    assert(got.contains("H"))
  }

  test("q_heavy_hitters output is deterministic across runs") {
    val a = SparkEntry.queries("q_heavy_hitters")(spark, Sf).collect()
    val b = SparkEntry.queries("q_heavy_hitters")(spark, Sf).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
  }
}
