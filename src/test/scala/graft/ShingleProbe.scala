package graft
object ShingleProbe {
  import org.apache.spark.sql.functions._
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(l: String)(f: => Long): Unit = {
      f; val t=(1 to 3).map{_=>val t0=System.nanoTime; val n=f; ((System.nanoTime-t0)/1e9, n)}
      println(f"$l%-28s min=${t.map(_._1).min}%.3f n=${t.head._2}")
    }
    val docs = graft.io.Sources.table(spark, "/root/testdata/sf0.1", "documents")
    time("rawShingles current") {
      docs.select(col("doc_id"),
        explode(graft.ops.Dedup.rawShingles(col("text"))).as("sh")).count() }
    val wsc = col("ws")
    val idx = when(size(wsc) >= 3, sequence(lit(1), size(wsc) - 2))
      .otherwise(array().cast("array<int>"))
    time("rawShingles materialized") {
      docs.select(col("doc_id"), graft.ops.TextOps.tokens(col("text")).as("ws"))
        .select(col("doc_id"), explode(array_distinct(transform(idx,
          i => concat_ws(" ", slice(wsc, i, lit(3)))))).as("sh")).count() }
    spark.stop()
  }
}
