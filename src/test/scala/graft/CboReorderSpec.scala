package graft

import org.apache.spark.sql.functions._

/** Cost-based join reorder, exercised end-to-end (round-12 VERDICT #6 —
  * SURVEY §4.2 documented the CBO row as "off by default" without ever
  * driving it): land TPC-H dimension/fact tables as catalog tables,
  * ANALYZE them, enable `spark.sql.cbo.joinReorder.enabled`, and
  * plan-assert that a deliberately bad syntactic join order gets
  * restructured. The TPC-H bench tier keeps its manual join order +
  * broadcast hints (CBO stays off in the session defaults — this spec
  * scopes and restores every flag it flips).
  */
class CboReorderSpec extends TestSpark {

  test("join reorder restructures a bad syntactic order under table stats") {
    val s = spark
    Seq("region", "nation", "customer", "orders").foreach { t =>
      // a previous JVM's dropped table leaves its warehouse dir behind,
      // and CREATE TABLE AS refuses the stale location — clear both
      s.sql(s"DROP TABLE IF EXISTS cbo_$t")
      val loc = new java.io.File(s"spark-warehouse/cbo_$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
      graft.io.Sources.table(s, Sf, t)
        .write.mode("overwrite").saveAsTable(s"cbo_$t")
      // rowCount + per-column NDV/min/max — what the reorder's join
      // cardinality estimates feed on
      s.sql(s"ANALYZE TABLE cbo_$t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    // worst-practice syntactic order: fact ⋈ fact first (orders ×
    // customer is the largest intermediate), the 5-row region last —
    // the shape a naive query writer produces and CBO exists to fix
    def query() = s.table("cbo_orders")
      .join(s.table("cbo_customer"),
        col("o_custkey") === col("c_custkey"))
      .join(s.table("cbo_nation"),
        col("c_nationkey") === col("n_nationkey"))
      .join(s.table("cbo_region"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_orders"))

    def optimized(cbo: Boolean): String = {
      s.conf.set("spark.sql.cbo.enabled", cbo.toString)
      s.conf.set("spark.sql.cbo.joinReorder.enabled", cbo.toString)
      try query().queryExecution.optimizedPlan.toString
      finally {
        s.conf.set("spark.sql.cbo.enabled", "false")
        s.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      }
    }
    val off = optimized(cbo = false)
    val on = optimized(cbo = true)
    assert(on !== off,
      s"CBO join reorder left the syntactic order untouched:\n$on")
    // and the reordered plan computes the same answer
    s.conf.set("spark.sql.cbo.enabled", "true")
    s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try {
      val a = query().collect().map(r => (r.getString(0), r.getLong(1)))
        .toMap
      s.conf.set("spark.sql.cbo.enabled", "false")
      s.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val b = query().collect().map(r => (r.getString(0), r.getLong(1)))
        .toMap
      assert(a === b)
    } finally {
      s.conf.set("spark.sql.cbo.enabled", "false")
      s.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    }
  }
}
