package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.Sources

/** S5 source specs: CSV and JSON round-trips through `Sources` with and
  * without explicit schemas (100 TB rule: pass the schema, never infer).
  */
class SourcesSpec extends TestSpark {

  import spark.implicits._

  test("csv round-trips with explicit schema (no inference scan)") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Seq((1L, "alpha", 1.5), (2L, "beta", -2.25))
      .toDF("id", "name", "score")
      .write.option("header", "true").mode("overwrite").csv(dir)
    val back = Sources.csv(spark, dir,
      Some("id BIGINT, name STRING, score DOUBLE"))
    assert(back.schema.map(_.dataType.simpleString) ===
      Seq("bigint", "string", "double"))
    val rows = back.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(rows(1).getDouble(2) === -2.25)
  }

  test("json round-trips and handles missing fields as nulls") {
    val dir = Files.createTempDirectory("graft_json").toString
    Seq("""{"id": 1, "tag": "x"}""", """{"id": 2}""")
      .toDS().write.mode("overwrite").text(dir)
    val back = Sources.json(spark, dir, Some("id BIGINT, tag STRING"))
      .orderBy("id").collect()
    assert(back.length === 2)
    assert(back(0).getString(1) === "x")
    assert(back(1).isNullAt(1))
  }

  test("orc round-trips real table data with predicate pushdown intact") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val src = Sources.table(spark, Sf, "events")
      .select("event_id", "user_id", "event_type", "value")
    src.write.mode("overwrite").orc(dir)
    val back = Sources.orc(spark, dir)
    assert(back.count() === src.count())
    // same content, both directions
    assert(back.exceptAll(src).count() === 0)
    assert(src.exceptAll(back).count() === 0)
    // the filter reaches the ORC scan (pushed, not post-scan)
    val plan = back.filter(col("user_id") === 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("EqualTo(user_id,7)"), s"no pushdown in:\n$plan")
  }
}
