package graft

object SimJoinProbe {
  import org.apache.spark.sql.functions._
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000).selectExpr("sum(id)").count()
    def time(l: String)(f: => Long): Unit = {
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime; val n = f
        ((System.nanoTime - t0) / 1e9, n)
      }
      println(f"$l%-30s min=${t.map(_._1).min}%.3f runs=${t.map(x => f"${x._1}%.2f").mkString(",")} n=${t.head._2}")
    }
    val docs = graft.io.Sources.table(spark, dir, "documents")
    val base = docs
      .select(col("doc_id"), graft.ops.TextOps.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 3)
    time("tokens sum")(base.select(sum(size(col("ws")))).collect()(0).getLong(0))
    val hashed = base.select(col("doc_id"),
      transform(col("ws"), w => xxhash64(w)).as("hs"))
    time("token-hash sum")(hashed.select(sum(size(col("hs")))).collect()(0).getLong(0))
    val toks = hashed.select(col("doc_id"), array_distinct(
      transform(graft.ops.TextOps.shingleIdx(col("hs")), i =>
        xxhash64(element_at(col("hs"), i),
          element_at(col("hs"), i + 1),
          element_at(col("hs"), i + 2)))).as("ts"))
    time("hashed shingles explode")(toks.select(col("doc_id"), explode(col("ts")).as("tok")).count())
    val exploded = toks.select(col("doc_id"), explode(col("ts")).as("tok"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("tok")
    time("window df")(exploded.select(col("doc_id"), col("tok"), count(lit(1)).over(w).as("df")).count())
    val dfreq = exploded.groupBy("tok").agg(count(lit(1)).as("df"))
    time("groupBy+join df")(exploded.join(dfreq, "tok").count())
    spark.stop()
  }
}
