package graft

import java.nio.file.Files

/** Correlated-subquery DML (r19 — `io/GraftDmlRule.scala`
  * existsSubquery): `DELETE FROM t WHERE EXISTS (SELECT 1 FROM s WHERE
  * s.k = t.k AND …)` and correlated `IN` decorrelate to the key frame
  * the key-pruned commands already consume. Pins: value semantics
  * against inline expectations and a randomized model, the pruning
  * contract (dirs the keys provably miss carry verbatim), tuple
  * (multi-equality) correlation landing merge-on-read, and the loud
  * refusals for non-equality correlation (NOT EXISTS lands since r19b — AntiDmlSpec).
  */
class CorrelatedDmlSpec extends TestSpark {

  import graft.io.TableFormat

  private val Provider = classOf[graft.io.TableFormatSourceProvider].getName

  private def freshRoot(): String =
    Files.createTempDirectory("graft_corr").toString

  test("EXISTS delete: semi-join semantics, zone-map pruning intact") {
    import spark.implicits._
    val root = freshRoot()
    spark.sql("DROP TABLE IF EXISTS graft_corr_t")
    spark.sql(s"""CREATE TABLE graft_corr_t (k BIGINT, v STRING)
      USING `$Provider` OPTIONS (path '$root/t', statsCols 'k')""")
    (0 until 3).foreach { i =>
      val lo = i * 100L
      TableFormat.append((lo until lo + 100L).map(k => (k, s"v$k"))
        .toDF("k", "v"), s"$root/t", statsCols = Seq("k"))
    }
    Seq((5L, 1), (7L, 0), (205L, 1), (205L, 1), (999L, 1))
      .toDF("k", "flag").createOrReplaceTempView("graft_corr_s")
    val before = TableFormat.snapshotDirs(s"$root/t",
      TableFormat.latestVersion(s"$root/t")).toSet
    spark.sql("""DELETE FROM graft_corr_t WHERE EXISTS
      (SELECT 1 FROM graft_corr_s s
       WHERE s.k = graft_corr_t.k AND s.flag = 1)""")
    // 5 and 205 delete (999 matches no row; 7 fails the residual; the
    // duplicate 205 is one key); the middle dir (100..199) carries
    val after = TableFormat.snapshotDirs(s"$root/t",
      TableFormat.latestVersion(s"$root/t")).toSet
    assert((before & after).size === 1,
      s"the keyless dir must carry verbatim: $before vs $after")
    val ks = spark.sql("SELECT k FROM graft_corr_t").collect()
      .map(_.getLong(0)).toSet
    assert(ks === (0L until 300L).toSet -- Set(5L, 205L))
    spark.sql("DROP TABLE graft_corr_t")
  }

  test("correlated IN update and EXISTS update hit exactly the matches") {
    import spark.implicits._
    val root = freshRoot()
    spark.sql("DROP TABLE IF EXISTS graft_corr_u")
    spark.sql(s"""CREATE TABLE graft_corr_u (k BIGINT, g BIGINT, v BIGINT)
      USING `$Provider` OPTIONS (path '$root/t', statsCols 'k')""")
    spark.sql("""INSERT INTO graft_corr_u
      SELECT id, id % 3, 0 FROM range(0, 30)""")
    Seq((4L, 1L), (4L, 2L), (9L, 0L)).toDF("k", "g")
      .createOrReplaceTempView("graft_corr_us")
    // correlated IN on k with a correlated equality on g: tuple (k, g)
    // — (4,1) matches row k=4 (g=1); (4,2) matches nothing; (9,0)
    // matches row k=9 (g=0)
    spark.sql("""UPDATE graft_corr_u SET v = 1 WHERE k IN
      (SELECT s.k FROM graft_corr_us s WHERE s.g = graft_corr_u.g)""")
    val hit = spark.sql("SELECT k FROM graft_corr_u WHERE v = 1")
      .collect().map(_.getLong(0)).toSet
    assert(hit === Set(4L, 9L), s"tuple-correlated IN must hit exactly: $hit")
    // EXISTS update with a residual predicate
    spark.sql("""UPDATE graft_corr_u SET v = 2 WHERE EXISTS
      (SELECT 1 FROM graft_corr_us s
       WHERE s.k = graft_corr_u.k AND s.g = 1)""")
    val hit2 = spark.sql("SELECT k FROM graft_corr_u WHERE v = 2")
      .collect().map(_.getLong(0)).toSet
    assert(hit2 === Set(4L))
    spark.sql("DROP TABLE graft_corr_u")
  }

  test("randomized model: correlated EXISTS/IN DELETE and UPDATE") {
    import spark.implicits._
    val rnd = new scala.util.Random(191919)
    val root = freshRoot()
    spark.sql("DROP TABLE IF EXISTS graft_corr_m")
    spark.sql(s"""CREATE TABLE graft_corr_m (k BIGINT, g BIGINT, v BIGINT)
      USING `$Provider` OPTIONS (path '$root/t', statsCols 'k,g')""")
    var model = Map.empty[Long, (Long, Long)] // k → (g, v)
    def check(stmt: String): Unit = {
      val got = spark.sql("SELECT k, g, v FROM graft_corr_m").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got === model, s"model drift after: $stmt")
    }
    (0 until 5).foreach { round =>
      val fresh = (0 until 3 + rnd.nextInt(5))
        .map(_ => rnd.nextInt(40).toLong).distinct
        .filterNot(model.contains)
      if (fresh.nonEmpty) {
        val vals = fresh.map(k => s"($k, ${k % 4}, $k)").mkString(", ")
        model ++= fresh.map(k => k -> ((k % 4, k))).toMap
        spark.sql(s"INSERT INTO graft_corr_m VALUES $vals")
        check("insert")
      }
      val side = (0 until 2 + rnd.nextInt(4)).map(_ =>
        (rnd.nextInt(40).toLong, rnd.nextInt(4).toLong)).distinct
      side.toDF("k", "g").createOrReplaceTempView("graft_corr_ms")
      if (rnd.nextBoolean()) {
        // EXISTS delete on (k) with residual on the side's g
        val gSel = rnd.nextInt(4).toLong
        model = model.filterNot { case (k, _) =>
          side.exists(s => s._1 == k && s._2 == gSel) }
        spark.sql(s"""DELETE FROM graft_corr_m WHERE EXISTS
          (SELECT 1 FROM graft_corr_ms s
           WHERE s.k = graft_corr_m.k AND s.g = $gSel)""")
        check(s"exists-delete g=$gSel")
      } else {
        // correlated IN update on the (k, g) tuple
        model = model.map { case (k, (g, v)) =>
          if (side.contains((k, g))) k -> ((g, v + 100)) else k -> ((g, v))
        }
        spark.sql("""UPDATE graft_corr_m SET v = v + 100 WHERE k IN
          (SELECT s.k FROM graft_corr_ms s WHERE s.g = graft_corr_m.g)""")
        check("corr-in-update")
      }
    }
    spark.sql("DROP TABLE graft_corr_m")
  }

  test("non-equality correlation refuses loudly; equality NOT EXISTS lands") {
    import spark.implicits._
    val root = freshRoot()
    spark.sql("DROP TABLE IF EXISTS graft_corr_r")
    spark.sql(s"""CREATE TABLE graft_corr_r (k BIGINT, v BIGINT)
      USING `$Provider` OPTIONS (path '$root/t')""")
    spark.sql("INSERT INTO graft_corr_r VALUES (1, 1), (2, 2)")
    Seq((1L, 5L)).toDF("k", "lim")
      .createOrReplaceTempView("graft_corr_rs")
    val e1 = intercept[Exception] {
      spark.sql("""DELETE FROM graft_corr_r WHERE EXISTS
        (SELECT 1 FROM graft_corr_rs s WHERE s.k < graft_corr_r.k)""")
    }
    assert(e1.getMessage.contains("EXISTS") ||
      e1.getMessage.contains("subquer"), e1.getMessage)
    // NOT EXISTS LANDS since r19b (the complement verb — AntiDmlSpec
    // owns its semantics); the refusal that remains on the NOT side is
    // non-equality correlation
    val e2 = intercept[Exception] {
      spark.sql("""DELETE FROM graft_corr_r WHERE NOT EXISTS
        (SELECT 1 FROM graft_corr_rs s WHERE s.k < graft_corr_r.k)""")
    }
    assert(e2.getMessage.contains("EXISTS") ||
      e2.getMessage.contains("subquer"), e2.getMessage)
    spark.sql("""DELETE FROM graft_corr_r WHERE NOT EXISTS
      (SELECT 1 FROM graft_corr_rs s WHERE s.k = graft_corr_r.k)""")
    val left = spark.sql("SELECT k FROM graft_corr_r").collect()
      .map(_.getLong(0)).toSet
    assert(left === Set(1L), s"equality-correlated NOT EXISTS lands: $left")
    spark.sql("DROP TABLE graft_corr_r")
  }
}
