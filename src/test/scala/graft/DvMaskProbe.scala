package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Scratch probe for the dv-mask substitution plan (not a test). */
object DvMaskProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.session
    import spark.implicits._
    import graft.io.TableFormat
    val Provider = classOf[graft.io.TableFormatSourceProvider].getName
    val base = Files.createTempDirectory("graft_dvprobe").toString
    val root = s"$base/t"
    spark.sql("DROP TABLE IF EXISTS graft_dvprobe")
    spark.sql(s"""CREATE TABLE graft_dvprobe (k BIGINT, s STRING)
      USING `$Provider` OPTIONS (path '$root', statsCols 'k')""")
    spark.sql(
      "INSERT INTO graft_dvprobe SELECT id, concat('s', id) FROM range(0, 100)")
    spark.sql(
      "INSERT INTO graft_dvprobe SELECT id, concat('s', id) FROM range(100, 200)")
    TableFormat.deleteKeysMor(spark, root, Seq(5L, 150L).toDF("k"), "k")
    spark.catalog.refreshTable("graft_dvprobe")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val q = spark.sql("SELECT k FROM graft_dvprobe WHERE k < 100")
    q.explain("extended")
    q.collect()
    val scans = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    scans.foreach(f => println(
      s"scan loc=${f.relation.location.getClass.getSimpleName} " +
        s"numFiles=${f.metrics("numFiles").value} " +
        s"pushed=${f.metadata.get("PushedFilters")} " +
        s"dataFilters=${f.dataFilters}"))
    spark.sql("DROP TABLE IF EXISTS graft_dvprobe")
  }
}
