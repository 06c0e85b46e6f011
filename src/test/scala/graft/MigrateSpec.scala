package graft

import java.nio.file.Files

/** End-to-end spec for the `Migrate` CLI (round-7 VERDICT item 4): the
  * arg-parsing contract, the parquet landing path driven through `main`
  * itself, and the JDBC append-delta semantics on a pre-existing database.
  */
class MigrateSpec extends TestSpark {

  test("parse rejects malformed and unknown argument lists") {
    assert(Migrate.parse(Array("--sf", "/x", "--out", "/y")) ===
      Map("sf" -> "/x", "out" -> "/y"))
    intercept[IllegalArgumentException] {
      Migrate.parse(Array("--sf")) // odd length
    }
    intercept[IllegalArgumentException] {
      // a flag with a missing value must NOT swallow the next flag
      Migrate.parse(Array("--sf", "--out", "/x", "zzz"))
    }
    intercept[IllegalArgumentException] {
      Migrate.parse(Array("positional", "value"))
    }
    intercept[IllegalArgumentException] {
      Migrate.parse(Array("--bogus", "v"))
    }
  }

  test("main lands the 7-table parquet bundle with counts matching " +
      "q_migrate_bundle") {
    val out = Files.createTempDirectory("graft_migrate_spec").toString
    // force the shared test session active so main adopts it (and must
    // NOT stop it — every later suite shares it)
    spark.sparkContext
    Migrate.main(Array("--sf", Sf, "--out", out))
    assert(!spark.sparkContext.isStopped,
      "Migrate.main stopped a session it did not create")
    val bundleCounts = graft.etl.Migration.migrateAll(spark, Sf)
      .map { case (name, df) => name -> df.count() }
    assert(bundleCounts.size === 7)
    bundleCounts.foreach { case (name, expected) =>
      val landed = spark.read.parquet(s"$out/$name.parquet").count()
      assert(landed === expected, s"table $name")
    }
    // and the bundle totals agree with the oracle-verified q_migrate_bundle
    // row universe (one digest row per landed row)
    val digestRows = SparkEntry.queries("q_migrate_bundle")(spark, Sf).count()
    assert(digestRows === bundleCounts.map(_._2).sum)
  }

  test("run over JDBC reports the append DELTA, not cumulative counts") {
    val db = Files.createTempDirectory("graft_migrate_derby").toString
    val url = s"jdbc:derby:$db/db;create=true"
    val first = Migrate.run(spark, Sf, "/unused", Some(url))
    first.foreach { case (name, source, landed) =>
      assert(landed === source, s"first append, table $name")
    }
    // second run appends the same rows again: cumulative table counts
    // double, but the reported delta must still equal the source counts
    val second = Migrate.run(spark, Sf, "/unused", Some(url))
    second.foreach { case (name, source, landed) =>
      assert(landed === source, s"second append delta, table $name")
    }
  }
}
