package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.io.{Layout, Sources}
import graft.ops.Skew

/** Physical-layout specs: bucketing elides the join shuffle; partitioned
  * layout prunes; salted join preserves join semantics. These assert on
  * the actual executed plan, not intent.
  */
class BucketingSpec extends TestSpark {

  import spark.implicits._

  /** The session catalog is in-memory but the warehouse dir persists
    * across JVMs — a leftover location fails saveAsTable with
    * LOCATION_ALREADY_EXISTS, so clear both before writing.
    */
  private def dropManaged(names: String*): Unit = {
    val warehouse = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    names.foreach { n =>
      spark.sql(s"DROP TABLE IF EXISTS $n")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(warehouse, n))
    }
  }

  test("co-located bucketed join plans with no shuffle exchange") {
    dropManaged("li_b", "o_b")
    val li = Sources.table(spark, Sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Sources.table(spark, Sf, "orders")
      .select("o_orderkey", "o_orderpriority")
    Layout.writeBucketed(li, "li_b", 4, Seq("l_orderkey"))
    Layout.writeBucketed(
      o.withColumnRenamed("o_orderkey", "l_orderkey"), "o_b", 4,
      Seq("l_orderkey"))

    val joined = Layout.table(spark, "li_b")
      .join(Layout.table(spark, "o_b"), "l_orderkey")
    // force a sort-merge plan (broadcast would hide the point)
    val smj = joined.hint("merge")
    val executed = smj.queryExecution.executedPlan
    val shuffles = executed.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty,
      s"expected shuffle-free co-located join, got:\n$executed")
    assert(smj.count() ===
      Sources.table(spark, Sf, "lineitem").count())
  }

  test("partitioned layout prunes partitions for equality predicates") {
    val dir = Files.createTempDirectory("graft_part").toString
    val o = Sources.table(spark, Sf, "orders")
      .withColumn("status", col("o_orderstatus"))
    Layout.writePartitioned(o, dir, Seq("status"))
    val pruned = spark.read.parquet(dir).filter(col("status") === "F")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head
    // partition filter must appear in the scan, not as a post-filter
    assert(scan.toString.contains("PartitionFilters") &&
      scan.toString.contains("status"),
      s"expected partition pruning in scan:\n$scan")
    val expected = o.filter(col("o_orderstatus") === "F").count()
    assert(pruned.count() === expected)
  }

  test("salted join equals the plain join") {
    val li = Sources.table(spark, Sf, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_linenumber"),
        col("l_quantity"))
    val dim = Sources.table(spark, Sf, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
    val plain = li.join(dim, "k")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val salted = Skew.saltedJoin(li, dim, "k", 8,
      Seq("k", "l_linenumber"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val a = plain.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = salted.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
  }
}
