package graft

/** Dev-only: decomposition timing for q_dedup_substring_run. */
object RunProbe {
  import org.apache.spark.sql.functions._
  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(l: String)(f: => Long): Unit = {
      f; val t=(1 to 3).map{_=>val t0=System.nanoTime; val n=f; ((System.nanoTime-t0)/1e9, n)}
      println(f"$l%-28s min=${t.map(_._1).min}%.3f n=${t.head._2}")
    }
    val docs = graft.io.Sources.table(spark, sf, "documents")
    val ws = graft.ops.TextOps.tokens(col("text"))
    val idx = when(size(ws) >= 8, sequence(lit(1), size(ws) - 7))
      .otherwise(array().cast("array<int>"))
    val grams = docs.select(col("doc_id"), posexplode(transform(idx,
        i => md5(concat_ws(" ", slice(ws, i, lit(8)))))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("g"))
    time("grams") { grams.count() }
    val shared = grams.groupBy("g")
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2 && col("nd") <= 64).select("g")
    time("shared") { shared.count() }
    val gs = grams.join(shared, Seq("g"))
    time("gs") { gs.count() }
    val pairs = gs.as("a").join(gs.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
    time("pairs") { pairs.count() }
    // materialized-ws variant
    val wsc = col("ws")
    val idx2 = when(size(wsc) >= 8, sequence(lit(1), size(wsc) - 7))
      .otherwise(array().cast("array<int>"))
    val grams2 = docs
      .select(col("doc_id"), graft.ops.TextOps.tokens(col("text")).as("ws"))
      .select(col("doc_id"), posexplode(transform(idx2,
        i => md5(concat_ws(" ", slice(wsc, i, lit(8)))))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("g"))
    time("grams materialized") { grams2.count() }
    val shared2 = grams2.groupBy("g")
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2 && col("nd") <= 64).select("g")
    val gs2 = grams2.join(shared2, Seq("g"))
    val pairs2 = gs2.as("a").join(gs2.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
    time("pairs materialized") { pairs2.count() }
    spark.stop()
  }
}
