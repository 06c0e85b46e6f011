package graft

/** Dev probe: where do q_simjoin_prefix's seconds go at sf0.1? */
object SimJoinProbe {
  import org.apache.spark.sql.functions._
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(l: String)(f: => Long): Unit = {
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime; val n = f
        ((System.nanoTime - t0) / 1e9, n)
      }
      println(f"$l%-32s min=${t.map(_._1).min}%.3f n=${t.head._2}")
    }
    val sets = graft.ops.SimJoin.orderedSets(spark, dir)
    time("orderedSets build+count")(sets.count())
    val prefixes = sets.select(col("doc_id"),
        slice(col("ts"), lit(1),
          (col("n") - ceil(lit(0.6) * col("n")) + 1).cast("int")).as("pf"))
      .select(col("doc_id"), lit(0).as("band_id"),
        explode(col("pf")).as("bkey"))
    time("prefix rows")(prefixes.count())
    val cand = graft.ops.Dedup.bucketPairs(prefixes)
    time("candidates")(cand.count())
    val inter = size(array_intersect(col("sa.ts"), col("sb.ts")))
    val j = inter.cast("double") / (col("sa.n") + col("sb.n") - inter)
    time("verified") {
      cand.join(sets.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sets.as("sb"), col("doc_b") === col("sb.doc_id"))
        .filter(j >= 0.6).count()
    }
    time("full query") {
      graft.SparkEntry.queries("q_simjoin_prefix")(spark, dir).count()
    }
    spark.stop()
  }
}
