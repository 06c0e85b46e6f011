package graft
object BloomProbeDev {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Seq("a","b","c").toDF("k").createOrReplaceTempView("build")
    Seq("a","x","y","b").toDF("k").createOrReplaceTempView("probe")
    try {
      val r = spark.sql("""
        SELECT k FROM probe
        WHERE might_contain(
          (SELECT bloom_filter_agg(xxhash64(k), 10, 1000) FROM build),
          xxhash64(k))""").collect().map(_.getString(0)).toSeq
      println("SQL-PATH OK: " + r)
    } catch { case e: Throwable => println("SQL-PATH FAIL: " + e) }
    // Dataset.scalar?
    val ds = Seq(1).toDF("x")
    println("scalar method: " + ds.getClass.getMethods.filter(_.getName == "scalar").mkString(","))
    spark.stop()
  }
}
