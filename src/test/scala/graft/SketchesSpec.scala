package graft

import org.apache.spark.sql.functions._

import graft.ops.Sketches

/** Guarantee specs for the Misra-Gries heavy-hitters sketch: superset of
  * the true heavy hitters and bounded count underestimation, under
  * ADVERSARIAL repartitioning — merge-order dependence changes the counts
  * but must never break the bounds.
  */
class SketchesSpec extends TestSpark {

  import spark.implicits._

  // skewed stream: token "hot_i" appears (11-i)*100 times for i<4 (the
  // heavy hitters), plus 2000 distinct singletons as noise
  private def fixture: Seq[String] = {
    val heavy = (0 until 4).flatMap(i => Seq.fill((11 - i) * 100)(s"hot_$i"))
    val noise = (0 until 2000).map(i => s"rare_$i")
    new scala.util.Random(7).shuffle(heavy ++ noise)
  }

  test("MG guarantees hold at every partitioning") {
    val data = fixture
    val n = data.size.toLong
    val m = 32
    val trueCounts = data.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong }
    val threshold = n / (m + 1).toLong

    Seq(1, 4, 17).foreach { parts =>
      val got = data.toDS().repartition(parts)
        .select(new Sketches.MisraGries(m).toColumn.name("hh"))
        .as[Seq[(String, Long)]].head().toMap
      // superset: every true heavy hitter (> N/(m+1)) survives
      trueCounts.filter(_._2 > threshold).foreach { case (k, c) =>
        assert(got.contains(k),
          s"parts=$parts lost heavy hitter $k (true $c > $threshold)")
      }
      // bounds: reported <= true, underestimated by at most N/(m+1)
      got.foreach { case (k, reported) =>
        val truth = trueCounts(k)
        assert(reported <= truth,
          s"parts=$parts overcounts $k: $reported > $truth")
        assert(reported >= truth - threshold,
          s"parts=$parts undershoots $k: $reported < $truth - $threshold")
      }
      assert(got.size <= m)
    }
  }

  test("MG per-group form surfaces each group's dominant token") {
    // keyed usage — groupBy(g).agg(udaf): partial sketches merge per group
    val mg = udaf(new Sketches.MisraGries(8))
    val df = Seq.tabulate(300)(i => (i % 3, if (i % 5 == 0) s"x$i" else s"dom${i % 3}"))
      .toDF("g", "tok")
    val out = df.groupBy("g").agg(mg(col("tok")).as("hh"))
      .select(col("g"), element_at(col("hh"), 1).getField("_1").as("top"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    (0 until 3).foreach(g => assert(out(g) === s"dom$g"))
  }
}
