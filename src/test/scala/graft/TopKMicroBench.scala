package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Dev-only micro-bench (run with `Test/runMain graft.TopKMicroBench`):
  * the bounded-heap [[Similarity.TopKAgg]] against the `orderBy(...).limit`
  * form (which plans as TakeOrderedAndProject) on a widened synthetic
  * corpus — the evidence behind COVERAGE.md's U2 note. Not part of
  * `sbt test`.
  */
object TopKMicroBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // deterministic pseudo-random scores, codegen'd (no rand(): stable runs)
    val scored = spark.range(n)
      .select(col("id"),
        (pmod(hash(col("id")), lit(1000000)).cast("double") / 1e6)
          .as("score"))

    def time(label: String)(f: => Unit): Double = {
      f // warm
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s $s%8.3f s")
      s
    }

    val sortLimit = time("orderBy+limit (TOaP)") {
      scored.orderBy(col("score").desc, col("id")).limit(10).collect()
    }
    val agg = time("TopKAgg bounded heap") {
      scored.as[(Long, Double)]
        .select(new Similarity.TopKAgg(10).toColumn.name("tk"))
        .toDF("tk").select(explode(col("tk"))).collect()
    }
    println(f"rows=$n heap/sort ratio = ${agg / sortLimit}%.2f")

    // grouped top-k: the composition where the aggregator matters — the
    // window form must SORT every group's full partition; the aggregator
    // keeps k-sized partial heaps with map-side combine
    val grouped = scored.withColumn("g", pmod(col("id"), lit(1000)))
    val viaWindow = time("grouped: window sort") {
      import org.apache.spark.sql.expressions.Window
      grouped.withColumn("rn",
          row_number().over(Window.partitionBy("g")
            .orderBy(col("score").desc, col("id"))))
        .filter(col("rn") <= 10).groupBy().count().collect()
    }
    // adapter: same heap buffer, keyed input element type
    class GroupedTopK(k: Int) extends org.apache.spark.sql.expressions
        .Aggregator[(Long, Long, Double), Similarity.TopKBuf,
          Seq[(Long, Double)]] {
      private val inner = new Similarity.TopKAgg(k)
      def zero: Similarity.TopKBuf = inner.zero
      def reduce(b: Similarity.TopKBuf, a: (Long, Long, Double)):
          Similarity.TopKBuf = inner.reduce(b, (a._2, a._3))
      def merge(x: Similarity.TopKBuf, y: Similarity.TopKBuf):
          Similarity.TopKBuf = inner.merge(x, y)
      def finish(b: Similarity.TopKBuf): Seq[(Long, Double)] =
        inner.finish(b)
      def bufferEncoder = inner.bufferEncoder
      def outputEncoder = inner.outputEncoder
    }
    val viaAgg = time("grouped: TopKAgg") {
      grouped.select(col("g"), col("id"), col("score"))
        .as[(Long, Long, Double)]
        .groupByKey(_._1)
        .agg(new GroupedTopK(10).toColumn.name("tk"))
        .toDF("g", "tk")
        .select(explode(col("tk"))).groupBy().count().collect()
    }
    // untyped UDAF registration: no typed-lambda boundary, hash aggregate
    // with map-side partial heaps
    val topkUdaf = udaf(new Similarity.TopKAgg(10))
    val viaUdaf = time("grouped: TopKAgg udaf") {
      grouped.groupBy("g").agg(topkUdaf(col("id"), col("score")).as("tk"))
        .select(explode(col("tk"))).groupBy().count().collect()
    }
    println(f"grouped heap/window ratio = ${viaAgg / viaWindow}%.2f, " +
      f"udaf/window = ${viaUdaf / viaWindow}%.2f")
    spark.stop()
  }
}
