package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Manifest value-distribution histograms (r19 — `io/QuantileHist.scala`
  * + the pre-CBO stats rule): fixed log-bin counts per (entry, column),
  * exactly mergeable (bin-wise sums), converted to Spark's equi-height
  * `Histogram` at stats time. Pins: the bin arithmetic (Column form ==
  * Scala form, range round-trip), exact mergeability across dirs, the
  * ANALYZE retrofit, rename re-keying, and the headline contract — a
  * deliberately SKEWED filter's join flips to the correct broadcast
  * decision only when histograms are present (min/max uniformity
  * over-estimates it ~2000×).
  */
class HistogramStatsSpec extends TestSpark {

  import graft.io.{QuantileHist, TableFormat}

  private def freshRoot(): String =
    Files.createTempDirectory("graft_hist").toString

  test("binOf/binRange: total, consistent, value-ordered") {
    val probe = Seq(Long.MinValue, Long.MinValue + 1, -1000000L, -8L,
      -7L, -1L, 0L, 1L, 2L, 7L, 8L, 9L, 15L, 16L, 100L, 1023L, 1024L,
      999999L, Long.MaxValue - 1, Long.MaxValue)
    probe.foreach { v =>
      val b = QuantileHist.binOf(v)
      val (lo, hi) = QuantileHist.binRange(b)
      if (v != Long.MinValue) // MinValue clamps into MaxValue's bin
        assert(lo <= v && v <= hi, s"value $v outside its bin $b [$lo,$hi]")
      assert(lo <= hi)
    }
    // bins are value-ordered: lo of bin(v2) > hi of bin(v1) when the
    // bins differ and v2's whole bin is above v1's
    val sorted = probe.filter(_ != Long.MinValue).sorted
    sorted.zip(sorted.tail).foreach { case (a, b) =>
      val (ba, bb) = (QuantileHist.binOf(a), QuantileHist.binOf(b))
      if (ba != bb)
        assert(QuantileHist.binRange(ba)._2 < QuantileHist.binRange(bb)._1,
          s"bins of $a and $b overlap")
    }
  }

  test("the Column bin form agrees with the Scala form; counts are exact") {
    import spark.implicits._
    val vals = Seq(-100000L, -9L, -1L, 0L, 0L, 1L, 1L, 1L, 5L, 8L, 12L,
      1024L, 1025L, 999999L, Long.MaxValue, Long.MinValue)
    val df = vals.toDF("k")
    val got = QuantileHist.counts(df, Seq("k"))("k")
    val want = vals.groupBy(QuantileHist.binOf)
      .map { case (b, vs) => b -> vs.size.toLong }
    assert(got === want, s"got $got want $want")
  }

  test("per-dir counts merge EXACTLY to the union's counts") {
    import spark.implicits._
    val root = freshRoot()
    val a = (0L until 400L).map(_ % 7)
    val b = (0L until 600L).map(i => i * i)
    TableFormat.append(a.toDF("k"), root, statsCols = Seq("k"),
      ndvCols = Seq("k"), histCols = Seq("k"))
    TableFormat.append(b.toDF("k"), root, statsCols = Seq("k"),
      ndvCols = Seq("k"), histCols = Seq("k"))
    val m = graft.io.TableFormat.colStats(spark, root) // forces nothing
    assert(m.count() >= 0) // touch
    val entries = {
      val v = TableFormat.latestVersion(root)
      TableFormat.snapshotDirs(root, v)
    }
    assert(entries.size === 2)
    // merged per-entry counts == one-pass counts over the union
    val perEntry = {
      val v = TableFormat.latestVersion(root)
      graft.io.TableFormat.readManifestFull(root, v).entries
        .map(e => QuantileHist.decode(e.hist("k")))
        .reduce(QuantileHist.merge)
    }
    val whole = QuantileHist.counts((a ++ b).toDF("k"), Seq("k"))("k")
    assert(perEntry === whole, "merge must be exact, not approximate")
  }

  test("ANALYZE retrofits histograms; rename re-keys them") {
    import spark.implicits._
    val root = freshRoot()
    TableFormat.append((0L until 500L).map(i => (i, s"s$i")).toDF("k", "s"),
      root, statsCols = Seq("k"))
    TableFormat.analyze(spark, root, Seq("k", "s"))
    val v = TableFormat.latestVersion(root)
    val e = graft.io.TableFormat.readManifestFull(root, v).entries.head
    assert(e.hist.contains("k") &&
      !graft.io.FreqSketch.isFreq(e.hist("k")),
      "analyze must land the numeric histogram")
    assert(e.hist.contains("s") &&
      graft.io.FreqSketch.isFreq(e.hist("s")),
      "string columns carry a frequency summary (r20), not a numeric " +
        "histogram")
    assert(QuantileHist.decode(e.hist("k")).values.sum === 500L)
    TableFormat.renameColumn(spark, root, "k", "id")
    val e2 = graft.io.TableFormat.readManifestFull(root,
      TableFormat.latestVersion(root)).entries.head
    assert(e2.hist.contains("id") && !e2.hist.contains("k"),
      "rename must re-key the histogram account")
  }

  test("once-analyzed stays analyzed: compaction re-counts the histogram") {
    import spark.implicits._
    val root = freshRoot()
    TableFormat.append((0L until 300L).map(i => (i % 5, i)).toDF("k", "v"),
      root, statsCols = Seq("k"), ndvCols = Seq("k"), histCols = Seq("k"))
    TableFormat.append((0L until 200L).map(i => (i % 3, i)).toDF("k", "v"),
      root, statsCols = Seq("k"), ndvCols = Seq("k"), histCols = Seq("k"))
    TableFormat.compact(spark, root)
    val e = graft.io.TableFormat.readManifestFull(root,
      TableFormat.latestVersion(root)).entries
    assert(e.size === 1 && e.head.hist.contains("k"),
      "the compacted dir must re-carry the histogram coverage")
    assert(QuantileHist.decode(e.head.hist("k")).values.sum === 500L,
      "the re-counted histogram covers every surviving row")
  }

  test("a skewed filter flips to broadcast ONLY with histograms present") {
    import spark.implicits._
    // 49.5k rows at k=1 plus a 500-row tail spread to 1e6: min/max
    // uniformity estimates k > 500 at ~99.95 % selectivity; the real
    // answer is ~1 %
    val skew = ((0L until 49500L).map(_ => 1L) ++
      (0L until 500L).map(i => 1000L + i * 1997L)).zipWithIndex
      .map { case (k, j) => (k, j.toLong % 1000L) }
    val other = (0L until 50000L).map(i => (i % 1000L, s"v$i"))
    def land(hist: Boolean): String = {
      val root = freshRoot() + "/t"
      TableFormat.append(skew.toDF("k", "j"), root,
        statsCols = Seq("k", "j"), ndvCols = Seq("k", "j"),
        histCols = if (hist) Seq("k") else Nil)
      root
    }
    val otherRoot = freshRoot() + "/o"
    TableFormat.append(other.toDF("j", "v"), otherRoot,
      statsCols = Seq("j"), ndvCols = Seq("j"))
    def plan(root: String): String = {
      TableFormat.registerSql(spark, root, "graft_hist_skew")
      TableFormat.registerSql(spark, otherRoot, "graft_hist_other")
      val s = spark
      val prev = Seq("spark.sql.cbo.enabled",
        "spark.sql.cbo.joinReorder.enabled",
        "spark.sql.autoBroadcastJoinThreshold")
        .map(k => k -> s.conf.get(k))
      s.conf.set("spark.sql.cbo.enabled", "true")
      s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", (256 * 1024).toString)
      try {
        val df = s.sql(
          """SELECT o.v, count(*) AS n
            |FROM graft_hist_skew f JOIN graft_hist_other o ON f.j = o.j
            |WHERE f.k > 500
            |GROUP BY o.v""".stripMargin)
        df.queryExecution.executedPlan.toString
      } finally prev.foreach { case (k, v) => s.conf.set(k, v) }
    }
    val withHist = plan(land(hist = true))
    val withoutHist = plan(land(hist = false))
    assert(withHist.contains("BroadcastHashJoin"),
      s"histogram selectivity must shrink the filtered side under the " +
        s"broadcast threshold:\n$withHist")
    assert(!withoutHist.contains("BroadcastHashJoin"),
      s"min/max uniformity must NOT broadcast (the flip is the " +
        s"histogram's doing):\n$withoutHist")
  }
}
