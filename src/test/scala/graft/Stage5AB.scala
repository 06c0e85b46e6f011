package graft

/** Dev-only interleaved A/B of corpus-pipeline stage 5+6: OLD (full
  * left-join contamination aggregate) vs NEW (bloom-pruned inner join).
  * Runs in ONE JVM, alternating variants, so host drift and JIT state
  * cancel out — cross-invocation Bench comparisons measured ±1.5 s drift
  * on identical code.
  */
object Stage5AB {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.LongType

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.io.Sources.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
      .filter(graft.ops.TextOps.keepRule(col("text")))
    val wEx = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text")))
    val ex = docs.withColumn("canon", min(col("doc_id")).over(wEx))
      .filter(col("doc_id") === col("canon"))
      .select(col("doc_id"), col("text"))
    val wFz = org.apache.spark.sql.expressions.Window.partitionBy("gid")
    val fz = ex
      .join(graft.ops.Dedup.componentLabels(spark, sf), Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"),
        coalesce(col("component_id"), col("doc_id")).as("gid"))
      .withColumn("canon", min(col("doc_id")).over(wFz))
      .filter(col("doc_id") === col("canon"))
      .select(col("doc_id"), col("text"), col("gid"))
    val sp = fz.withColumn("bucket", graft.ops.TextOps.splitBucket(col("gid")))
      .persist()
    sp.count()

    val sh = sp.select(col("doc_id"), col("bucket"),
      explode(graft.ops.Dedup.rawShingles(col("text"))).as("sh"))
    val testShRows = sh.filter(col("bucket") >= 95).select("sh")

    def stage6(hits: DataFrame): Long = {
      val wPk = org.apache.spark.sql.expressions.Window
        .partitionBy("shard").orderBy("doc_id")
      sp.filter(col("bucket") < 90)
        .join(hits, Seq("doc_id"), "left")
        .filter(lit(2L) * coalesce(col("n_hit"), lit(0L))
          <= coalesce(col("n_sh"), lit(0L)))
        .select(col("doc_id"), col("gid"),
          size(graft.ops.TextOps.tokens(col("text"))).cast(LongType)
            .as("n_tokens"),
          (col("doc_id") % 32).as("shard"))
        .withColumn("cum_tokens", sum(col("n_tokens")).over(wPk))
        .withColumn("seq_id",
          ((col("cum_tokens") - col("n_tokens")) / 256L).cast(LongType))
        .select("doc_id", "gid", "n_tokens", "shard", "seq_id")
        .orderBy("doc_id").count()
    }

    def oldForm(): Long = stage6(
      sh.filter(col("bucket") < 90).select(col("doc_id"), col("sh"))
        .join(testShRows.distinct().withColumn("hit", lit(1L)),
          Seq("sh"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_sh"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit")))

    def newForm(): Long = stage6(
      graft.ops.Bloom.prune(
          sh.filter(col("bucket") < 90).select(col("doc_id"), col("sh")),
          "sh", testShRows, "sh")
        .join(testShRows.distinct(), Seq("sh"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_hit"))
        .join(sp.select(col("doc_id"), col("text")), Seq("doc_id"))
        .select(col("doc_id"), col("n_hit"),
          size(graft.ops.Dedup.rawShingles(col("text"))).cast(LongType)
            .as("n_sh")))

    def noBloomForm(): Long = stage6(
      sh.filter(col("bucket") < 90).select(col("doc_id"), col("sh"))
        .join(testShRows.distinct(), Seq("sh"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_hit"))
        .join(sp.select(col("doc_id"), col("text")), Seq("doc_id"))
        .select(col("doc_id"), col("n_hit"),
          size(graft.ops.Dedup.rawShingles(col("text"))).cast(LongType)
            .as("n_sh")))

    def smallBloomForm(): Long = stage6(
      graft.ops.Bloom.prune(
          sh.filter(col("bucket") < 90).select(col("doc_id"), col("sh")),
          "sh", testShRows, "sh", 1L << 20)
        .join(testShRows.distinct(), Seq("sh"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_hit"))
        .join(sp.select(col("doc_id"), col("text")), Seq("doc_id"))
        .select(col("doc_id"), col("n_hit"),
          size(graft.ops.Dedup.rawShingles(col("text"))).cast(LongType)
            .as("n_sh")))

    // stage 6 with n_sh computed map-side over the cached train docs —
    // no attach join; hits carries only n_hit
    def stage6M(hits: DataFrame): Long = {
      val wPk = org.apache.spark.sql.expressions.Window
        .partitionBy("shard").orderBy("doc_id")
      sp.filter(col("bucket") < 90)
        .withColumn("n_sh",
          size(graft.ops.Dedup.rawShingles(col("text"))).cast(LongType))
        .join(hits, Seq("doc_id"), "left")
        .filter(lit(2L) * coalesce(col("n_hit"), lit(0L)) <= col("n_sh"))
        .select(col("doc_id"), col("gid"),
          size(graft.ops.TextOps.tokens(col("text"))).cast(LongType)
            .as("n_tokens"),
          (col("doc_id") % 32).as("shard"))
        .withColumn("cum_tokens", sum(col("n_tokens")).over(wPk))
        .withColumn("seq_id",
          ((col("cum_tokens") - col("n_tokens")) / 256L).cast(LongType))
        .select("doc_id", "gid", "n_tokens", "shard", "seq_id")
        .orderBy("doc_id").count()
    }

    def bloomLean(): Long = stage6M(
      graft.ops.Bloom.prune(
          sh.filter(col("bucket") < 90).select(col("doc_id"), col("sh")),
          "sh", testShRows, "sh", 1L << 20)
        .join(testShRows.distinct(), Seq("sh"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_hit")))

    def noBloomLean(): Long = stage6M(
      sh.filter(col("bucket") < 90).select(col("doc_id"), col("sh"))
        .join(testShRows.distinct(), Seq("sh"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_hit")))

    // warm all
    println(s"old n=${oldForm()} new n=${newForm()} nb n=${noBloomForm()} sm n=${smallBloomForm()} bl n=${bloomLean()} nbl n=${noBloomLean()}")
    val t = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.ArrayBuffer[Double]]
    val fns = Seq("old" -> (() => oldForm()), "new" -> (() => newForm()),
      "noBloom" -> (() => noBloomForm()),
      "smallBloom" -> (() => smallBloomForm()),
      "bloomLean" -> (() => bloomLean()),
      "noBloomLean" -> (() => noBloomLean()))
    fns.foreach { case (k, _) =>
      t(k) = scala.collection.mutable.ArrayBuffer.empty[Double] }
    (1 to 5).foreach { _ =>
      fns.foreach { case (k, f) =>
        val t0 = System.nanoTime; f(); t(k) += (System.nanoTime - t0) / 1e9
      }
    }
    fns.foreach { case (k, _) =>
      val a = t(k)
      println(f"$k%-10s min=${a.min}%.3f med=${a.sorted.apply(2)}%.3f  all=${a.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
