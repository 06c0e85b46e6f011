package graft

import org.apache.spark.sql.functions._

/** The Verify-time schema guard: the driver's compare harness sorts
  * result cells in pandas, which cannot hash array/map/struct values —
  * a query emitting one ships a red CORRECTNESS row (round 1
  * `q_agg_collect`, round 13 `q_text_postings`). These specs make the
  * rule mechanical: the guard must reject such schemas loudly, and no
  * registered query may carry one.
  */
class VerifyGuardSpec extends TestSpark {

  test("guard rejects an array-output query, naming query and column") {
    import spark.implicits._
    val df = Seq((1, Seq(2, 3))).toDF("k", "postings")
      .groupBy("k").agg(collect_list("postings").as("postings"))
    val e = intercept[IllegalStateException] {
      Verify.assertHashableSchema("q_synthetic_bad", df.schema)
    }
    assert(e.getMessage.contains("q_synthetic_bad"))
    assert(e.getMessage.contains("postings"))
    assert(e.getMessage.contains("array"))
  }

  test("guard rejects map and struct columns too") {
    import spark.implicits._
    val m = Seq((1, "a")).toDF("k", "v")
      .select(col("k"), map(col("v"), col("k")).as("m"))
    assert(intercept[IllegalStateException] {
      Verify.assertHashableSchema("q_map", m.schema)
    }.getMessage.contains("`m`"))
    val st = Seq((1, "a")).toDF("k", "v")
      .select(struct(col("k"), col("v")).as("s"))
    assert(intercept[IllegalStateException] {
      Verify.assertHashableSchema("q_struct", st.schema)
    }.getMessage.contains("`s`"))
  }

  test("guard passes flat schemas") {
    import spark.implicits._
    Verify.assertHashableSchema("q_ok",
      Seq((1, "a", 2.0)).toDF("k", "s", "d").schema)
  }

  test("every registered query's result schema is hashable") {
    // analysis only (`.schema` does not execute the query); queries with
    // eager plan-time scalars (BPE merges, IVF centroids, MG sketch) run
    // their small driver-side jobs at sf0.001 — bounded by design
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          Verify.assertHashableSchema(name, fn(spark, Sf).schema); None
        } catch {
          case e: IllegalStateException => Some(e.getMessage)
        }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
