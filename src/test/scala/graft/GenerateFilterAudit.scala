package graft

/** Dev-only: find queries whose physical plan carries an inferred
  * generate-filter with the tokenization inlined (the O(tokens^2) trap).
  */
object GenerateFilterAudit {
  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.001"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the trap's signature: a Filter condition computing the shingle
    // transform with split() inside the per-element lambda
    val sig = "lambdafunction\\(concat_ws\\( , slice\\(filter\\(split\\(".r
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val hits = plan.split('\n').filter(l =>
          l.contains("Filter") && sig.findFirstIn(l).isDefined)
        if (hits.nonEmpty) println(s"TRAP $name (${hits.length} filters)")
      } catch { case e: Throwable => println(s"SKIP $name: ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
