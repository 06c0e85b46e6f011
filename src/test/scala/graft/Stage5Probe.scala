package graft

/** Dev-only micro-profiler for corpus-pipeline stage 5 variants (round-11
  * Bloom A/B). Not a ScalaTest suite — run with Test/runMain. Times each
  * subtree over the REAL survivor frame at the given SF.
  */
object Stage5Probe {
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

    // reproduce sp: stages 1-4 of the pipeline, persisted
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
    println(s"survivors: ${sp.count()}")

    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach(_ => f) // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime; val n = f
        (System.nanoTime - t0) / 1e9 -> n
      }
      println(f"$label%-40s min=${times.map(_._1).min}%.3f s  n=${times.head._2}")
    }

    val sh = sp
      .select(col("doc_id"), col("bucket"),
        graft.ops.Dedup.rawShingles(col("text")).as("arr"))
      .select(col("doc_id"), col("bucket"),
        size(col("arr")).cast(LongType).as("n_sh"),
        explode(col("arr")).as("sh"))
    val testShRows = sh.filter(col("bucket") >= 95).select("sh")
    val trainSh = sh.filter(col("bucket") < 90)
      .select(col("doc_id"), col("n_sh"), col("sh"))

    time("explode train shingles (scan+shingle)") { trainSh.count() }
    time("explode test shingles only") { testShRows.count() }
    time("bloom agg job alone (collect 1 row)") {
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      import org.apache.spark.sql.graftbridge.ColumnBridge
      val agg = new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col("sh"))),
        Literal((1L << 23) / 10), Literal(1L << 23))
      testShRows.agg(ColumnBridge.column(agg.toAggregateExpression()))
        .collect().length.toLong }
    time("probe with precomputed literal filter") {
      import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
      import org.apache.spark.sql.graftbridge.ColumnBridge
      val agg = new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col("sh"))),
        Literal((1L << 23) / 10), Literal(1L << 23))
      val blob = testShRows.agg(ColumnBridge.column(agg.toAggregateExpression()))
        .collect()(0).getAs[Array[Byte]](0)
      trainSh.filter(ColumnBridge.column(BloomFilterMightContain(
        Literal(blob),
        ColumnBridge.expression(xxhash64(col("sh")))))).count() }
    time("prune only (filter+probe)") {
      graft.ops.Bloom.prune(trainSh, "sh", testShRows, "sh").count() }
    time("NEW hits: prune+join+agg") {
      graft.ops.Bloom.prune(trainSh, "sh", testShRows, "sh")
        .join(testShRows.distinct(), Seq("sh"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_hit"), max(col("n_sh")).as("n_sh"))
        .count() }
    time("OLD cont: left join+agg all train") {
      trainSh.select(col("doc_id"), col("sh"))
        .join(testShRows.distinct().withColumn("hit", lit(1L)),
          Seq("sh"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_sh"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .count() }
    spark.stop()
  }
}
