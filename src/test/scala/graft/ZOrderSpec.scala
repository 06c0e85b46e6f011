package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The data-skipping proof for the z-order layout tier
  * ([[graft.io.Layout.mortonKey]] / [[graft.io.Layout.writeZOrdered]]):
  * land the SAME rows twice — z-clustered on (custkey, order-day) and
  * id-clustered — run the same box predicate over both, and show the z
  * layout concentrates the matches into a fraction of the files while
  * the id layout smears them across all of them. File concentration is
  * THE portable skipping property: any reader with per-file (or
  * row-group) min/max stats — Spark's parquet footer pruning included —
  * skips exactly the files that contain no matches, so "matches touch
  * few files" is "the scan reads few files" at 100 TB.
  *
  * Key correctness (the interleave arithmetic itself) is owned by the
  * `q_layout_zorder` DuckDB oracle row; this suite owns the physical
  * effect.
  */
class ZOrderSpec extends TestSpark {

  private val Files = 16

  private def dims: DataFrame = {
    val d = graft.io.Sources.table(spark, Sf, "orders")
      .select(col("o_orderkey"), col("o_custkey").as("x"),
        datediff(col("o_orderdate").cast(org.apache.spark.sql.types.DateType),
          to_date(lit("1970-01-01"))).cast("long").as("y"))
    val st = d.agg(min("x").as("xmin"), max("x").as("xmax"),
      min("y").as("ymin"), max("y").as("ymax"))
    d.crossJoin(broadcast(st))
      .select(col("o_orderkey"), col("x"), col("y"),
        graft.io.Layout.mortonKey(
          graft.io.Layout.zRank(col("x"), col("xmin"), col("xmax"), 16),
          graft.io.Layout.zRank(col("y"), col("ymin"), col("ymax"), 16),
          16).as("zkey"))
  }

  test("box predicate touches a fraction of z-clustered files, all id-clustered ones") {
    val d = dims.cache()
    try {
      val (xmin, xmax) = {
        val r = d.agg(min("x"), max("x")).head; (r.getLong(0), r.getLong(1))
      }
      val (ymin, ymax) = {
        val r = d.agg(min("y"), max("y")).head; (r.getLong(0), r.getLong(1))
      }
      // the middle-eighth box in both dimensions: 1/64 of the plane
      def mid(lo: Long, hi: Long): (Long, Long) = {
        val span = hi - lo
        (lo + (span * 7) / 16, lo + (span * 9) / 16)
      }
      val (xlo, xhi) = mid(xmin, xmax)
      val (ylo, yhi) = mid(ymin, ymax)

      val zPath = ZOrderSpec.tmpRoot + "/z"
      val idPath = ZOrderSpec.tmpRoot + "/id"
      graft.io.Layout.writeZOrdered(d, zPath, "zkey", Files)
      d.repartitionByRange(Files, col("o_orderkey"))
        .sortWithinPartitions(col("o_orderkey"))
        .write.mode("overwrite").parquet(idPath)

      def probe(path: String): (Long, Long) = {
        val hits = spark.read.parquet(path)
          .filter(col("x").between(xlo, xhi) && col("y").between(ylo, yhi))
          .select(input_file_name().as("f"), col("o_orderkey"))
        (hits.count(), hits.select("f").distinct().count())
      }
      val (zRows, zFiles) = probe(zPath)
      val (idRows, idFiles) = probe(idPath)

      assert(zRows === idRows && zRows > 0,
        s"layouts disagree on the box contents: z=$zRows id=$idRows")
      // id order is independent of (x, y): the box's rows smear across a
      // majority of the files (not ALL of them at small SF — the box only
      // holds a few hundred rows, so a file can miss by chance)
      assert(idFiles >= Files / 2,
        s"id layout unexpectedly concentrated the box ($idFiles/$Files files)")
      // the z curve puts a 1/16-area box into a handful of z intervals
      assert(zFiles * 2 <= idFiles,
        s"z layout should halve the touched files: z=$zFiles id=$idFiles")
    } finally d.unpersist()
  }

  test("z files cover bounded rectangles; id files cover the full plane") {
    // per-file (x, y) extent = what a min/max-pruning reader sees. The
    // mean z-file rectangle must cover a small fraction of the plane —
    // each id file covers essentially all of it.
    def meanFileArea(path: String): Double = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(((max("x") - min("x")).cast("double") *
          (max("y") - min("y")).cast("double")).as("area"))
      perFile.agg(avg("area")).head.getDouble(0)
    }
    val total = {
      val r = dims.agg(
        ((max("x") - min("x")).cast("double") *
          (max("y") - min("y")).cast("double")).as("a")).head
      r.getDouble(0)
    }
    val zArea = meanFileArea(ZOrderSpec.tmpRoot + "/z")
    val idArea = meanFileArea(ZOrderSpec.tmpRoot + "/id")
    assert(zArea < total * 0.5,
      f"z files should cover small rectangles: ${zArea / total}%.2f of plane")
    assert(idArea > total * 0.8,
      f"id files should span the plane: ${idArea / total}%.2f of plane")
    assert(zArea < idArea / 2)
  }
}

object ZOrderSpec {
  // Unique per test-JVM so concurrent `sbt test` runs never clobber
  // each other's landed layout mid-probe.
  val tmpRoot: String =
    java.nio.file.Files.createTempDirectory("graft_zorder_").toString
}
