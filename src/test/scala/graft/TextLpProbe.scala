package graft

/** Dev-only profiler for the round-11 text-quality queries. */
object TextLpProbe {
  import org.apache.spark.sql.functions._

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Long): Unit = {
      f
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
      }
      println(f"$label%-30s min=${t.min}%.3f")
    }

    val docs = graft.io.Sources.table(spark, sf, "documents")
    time("unigram_lp (control)") {
      SparkEntry.queries("q_text_unigram_lp")(spark, sf).count() }
    time("quality_nb full") {
      SparkEntry.queries("q_quality_nb")(spark, sf).count() }
    time("bigram_lp full") {
      SparkEntry.queries("q_text_bigram_lp")(spark, sf).count() }
    // pieces
    val ws = graft.ops.TextOps.tokens(col("text"))
    time("toks explode + keepRule") {
      docs.select(col("doc_id"),
        graft.ops.TextOps.keepRule(col("text")).as("k"),
        explode(ws).as("w")).count() }
    time("bigram explode (expr ws)") {
      val arr = when(size(ws) >= 2, transform(sequence(lit(0), size(ws) - 2),
          i => struct(
            concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2))
              .as("big"),
            element_at(ws, i + 1).as("w1"))))
        .otherwise(array().cast("array<struct<big:string,w1:string>>"))
      docs.select(col("doc_id"), explode(arr).as("p")).count() }
    time("bigram explode (materialized ws)") {
      val w2 = col("ws")
      val arr = when(size(w2) >= 2, transform(sequence(lit(0), size(w2) - 2),
          i => struct(
            concat_ws(" ", element_at(w2, i + 1), element_at(w2, i + 2))
              .as("big"),
            element_at(w2, i + 1).as("w1"))))
        .otherwise(array().cast("array<struct<big:string,w1:string>>"))
      docs.select(col("doc_id"), ws.as("ws"))
        .select(col("doc_id"), explode(arr).as("p")).count() }
    // NB pieces
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val toks = docs.select(col("doc_id"),
      graft.ops.TextOps.keepRule(col("text")).as("weak_keep"),
      explode(ws).as("w"))
    val cc = toks.groupBy("w")
      .agg(sum(when(col("weak_keep"), 1L).otherwise(0L)).as("ck"),
        sum(when(!col("weak_keep"), 1L).otherwise(0L)).as("cd"))
    time("nb cc count") { cc.count() }
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val model = cc
      .withColumn("nk", sum(col("ck")).over(wAll))
      .withColumn("nd", sum(col("cd")).over(wAll))
      .withColumn("v", count(lit(1)).over(wAll))
      .select(col("w"),
        (log((col("ck") + 1).cast(DoubleType) / (col("nk") + col("v")))
          - log((col("cd") + 1).cast(DoubleType) / (col("nd") + col("v"))))
          .cast(DecimalType(20, 10)).as("llr"))
    time("nb model count") { model.count() }
    val score = toks.join(broadcast(model), Seq("w"))
      .groupBy(col("doc_id"), col("weak_keep"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("llr")).as("llr_sum"))
    time("nb score join") { score.count() }
    // fixed shape: keepRule + tokens computed in a select BELOW the
    // explode select, so ExtractGenerator leaves them under the Generate
    val toksF = docs
      .select(col("doc_id"),
        graft.ops.TextOps.keepRule(col("text")).as("weak_keep"),
        ws.as("ws"))
      .select(col("doc_id"), col("weak_keep"), explode(col("ws")).as("w"))
    val ccF = toksF.groupBy("w")
      .agg(sum(when(col("weak_keep"), 1L).otherwise(0L)).as("ck"),
        sum(when(!col("weak_keep"), 1L).otherwise(0L)).as("cd"))
    val modelF = ccF
      .withColumn("nk", sum(col("ck")).over(wAll))
      .withColumn("nd", sum(col("cd")).over(wAll))
      .withColumn("v", count(lit(1)).over(wAll))
      .select(col("w"),
        (log((col("ck") + 1).cast(DoubleType) / (col("nk") + col("v")))
          - log((col("cd") + 1).cast(DoubleType) / (col("nd") + col("v"))))
          .cast(DecimalType(20, 10)).as("llr"))
    val scoreF = toksF.join(broadcast(modelF), Seq("w"))
      .groupBy(col("doc_id"), col("weak_keep"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("llr")).as("llr_sum"))
    time("nb score FIXED") { scoreF.count() }
    val s = scoreF.queryExecution.executedPlan.toString
    println("keepRule above generate still? " +
      s.split("Generate", 2)(0).contains("array_contains"))
    spark.stop()
  }
}
