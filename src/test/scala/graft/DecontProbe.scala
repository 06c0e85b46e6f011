package graft

/** Dev-only: decomposition timing for q_decontaminate_clean. */
object DecontProbe {
  import org.apache.spark.sql.functions._
  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(l: String)(f: => Long): Unit = {
      f; val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime; val n = f
        ((System.nanoTime - t0) / 1e9, n)
      }
      println(f"$l%-28s min=${t.map(_._1).min}%.3f n=${t.head._2}")
    }
    val docs = graft.io.Sources.table(spark, sf, "documents")
    val sh = docs
      .select(col("doc_id"), col("source"),
        graft.ops.TextOps.splitBucket(col("doc_id")).as("bucket"),
        graft.ops.TextOps.tokens(col("text")).as("ws"))
      .select(col("doc_id"), col("source"), col("bucket"),
        explode(graft.ops.Dedup.rawShinglesWs(col("ws"))).as("sh"))
    time("sh") { sh.count() }
    val flagged = graft.ops.TextOps.boilerplateFlagged(docs)
    time("flagged") { flagged.count() }
    val clean = sh.join(
      broadcast(flagged.withColumnRenamed("g", "sh")),
      Seq("source", "sh"), "left_anti")
    time("clean(bcast anti)") { clean.count() }
    time("q_decontaminate") {
      SparkEntry.queries("q_decontaminate")(spark, sf).count()
    }
    time("q_decontaminate_clean") {
      SparkEntry.queries("q_decontaminate_clean")(spark, sf).count()
    }
    spark.stop()
  }
}
