package graft

import java.nio.file.Files

import graft.io.TableFormat

/** Model check for SCHEMA EVOLUTION interleaved with DML: a map
  * replays randomized INSERT / ALTER TABLE ADD COLUMNS / ALTER COLUMN
  * TYPE widening (r20) / evolution
  * MERGE / width-straddling UPDATE / DELETE / OPTIMIZE histories
  * alongside the catalog table, and after every statement the table
  * must equal the model. This is the interaction layer the
  * per-statement examples can't give: dirs of DIFFERENT widths coexist
  * after every widening, so each subsequent statement exercises
  * null-backfilled reads, masks, and rewrites over a mixed-schema
  * snapshot. Null cells ride a sentinel (the generators keep values
  * non-negative). Seeded, bounded.
  */
class SchemaEvolutionModelSpec extends TestSpark {

  private val Provider = classOf[graft.io.TableFormatSourceProvider].getName
  private val NULLV = -1L

  test("widening interleaves with DML — table equals model throughout") {
    val rnd = new scala.util.Random(181818)
    (1 to 2).foreach { seed =>
      val base = Files.createTempDirectory(s"graft_evol_model$seed")
      val root = s"$base/t"
      spark.sql("DROP TABLE IF EXISTS graft_evol_model")
      // v starts NARROW (INT) — round 0 widens it to BIGINT, so every
      // later statement reads mixed narrow/wide physical files
      spark.sql(s"""CREATE TABLE graft_evol_model (k BIGINT, v INT)
        USING `$Provider` OPTIONS (path '$root', statsCols 'k')""")
      // model value: (v, w, e); w exists from round 1, e from round 2 —
      // before that the table simply lacks the column
      var model = Map.empty[Long, (Long, Long, Long)]
      var width = 0 // 0 = (k,v), 1 = +w, 2 = +w,e
      def check(stmt: String): Unit = {
        val cols = Seq("k", "v") ++ (if (width >= 1) Seq("w") else Nil) ++
          (if (width >= 2) Seq("e") else Nil)
        val got = spark.sql(
          s"SELECT ${cols.mkString(", ")} FROM graft_evol_model")
          .collect().map { r =>
            // v may be INT (pre-widen) or BIGINT (post-widen)
            r.getLong(0) -> ((r.getAs[Number](1).longValue,
              if (width >= 1 && !r.isNullAt(2)) r.getLong(2) else NULLV,
              if (width >= 2 && !r.isNullAt(3)) r.getLong(3) else NULLV))
          }.toMap
        assert(got === model, s"[seed $seed] model drift after: $stmt")
      }
      def runSql(stmt: String): Unit = { spark.sql(stmt); check(stmt) }

      (0 until 5).foreach { round =>
        // fresh inserts at the CURRENT width (dup-free: model is a map)
        val fresh = (0 until 2 + rnd.nextInt(5))
          .map(_ => rnd.nextInt(70).toLong).distinct
          .filterNot(model.contains)
        if (fresh.nonEmpty) {
          val vals = fresh.map { k =>
            width match {
              case 0 => s"($k, ${k % 9})"
              case 1 => s"($k, ${k % 9}, ${k % 5})"
              case _ => s"($k, ${k % 9}, ${k % 5}, ${k % 3})"
            }
          }.mkString(", ")
          model ++= fresh.map(k => k -> ((k % 9,
            if (width >= 1) k % 5 else NULLV,
            if (width >= 2) k % 3 else NULLV))).toMap
          runSql(s"INSERT INTO graft_evol_model VALUES $vals")
        }
        if (round == 0) { // TYPE widen (r20): metadata-only, the
          // standing narrow files promote at scan time; a post-widen
          // insert lands a value only BIGINT holds
          runSql("ALTER TABLE graft_evol_model ALTER COLUMN v TYPE BIGINT")
          val bigK = 100L + seed
          model += bigK -> ((bigK + 3000000000L, NULLV, NULLV))
          runSql(s"INSERT INTO graft_evol_model VALUES " +
            s"($bigK, ${bigK + 3000000000L})")
        }
        if (round == 1) { // ALTER widens; every existing row reads null
          width = 1
          runSql("ALTER TABLE graft_evol_model ADD COLUMNS (w BIGINT)")
          // an UPDATE straddling the widening writes the new column
          // over dirs that never carried it
          val lo = rnd.nextInt(40).toLong; val hi = lo + rnd.nextInt(30)
          model = model.map {
            case (k, (v, _, e)) if k >= lo && k <= hi =>
              k -> ((v, k * 2, e))
            case kept => kept
          }
          runSql(s"""UPDATE graft_evol_model SET w = k * 2
            WHERE k BETWEEN $lo AND $hi""")
        }
        if (round == 2) { // evolution MERGE adds e through the stars
          width = 2
          val keys = (0 until 2 + rnd.nextInt(5))
            .map(_ => rnd.nextInt(80).toLong).distinct
          val vals = keys.map(k =>
            s"($k, ${k % 9 + 100}, ${k % 5}, ${k % 3 + 10})")
            .mkString(", ")
          model ++= keys.map(k =>
            k -> ((k % 9 + 100, k % 5, k % 3 + 10))).toMap
          // cast the source: inline VALUES literals are INT, and an
          // evolved column lands with the SOURCE's type
          runSql(s"""MERGE WITH SCHEMA EVOLUTION INTO graft_evol_model t
            USING (SELECT CAST(k AS BIGINT) AS k, CAST(v AS BIGINT) AS v,
                     CAST(w AS BIGINT) AS w, CAST(e AS BIGINT) AS e
                   FROM VALUES $vals AS d(k, v, w, e)) src
            ON t.k = src.k
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *""")
        }
        rnd.nextInt(3) match {
          case 0 => // range delete over the mixed-width snapshot
            val lo = rnd.nextInt(70).toLong; val hi = lo + rnd.nextInt(15)
            model = model.filterNot { case (k, _) => k >= lo && k <= hi }
            runSql(
              s"DELETE FROM graft_evol_model WHERE k BETWEEN $lo AND $hi")
          case 1 if width >= 1 => // predicate ON the evolved column —
            // null-backfilled rows must survive (NULL keeps the row
            // out of the delete per SQL)
            val m = 2 + rnd.nextInt(3); val r = rnd.nextInt(m)
            model = model.filterNot {
              case (_, (_, w, _)) => w != NULLV && w % m == r }
            runSql(s"DELETE FROM graft_evol_model WHERE w % $m = $r")
          case _ => // update straddling every width generation
            val lo = rnd.nextInt(70).toLong; val hi = lo + rnd.nextInt(25)
            model = model.map {
              case (k, (v, w, e)) if k >= lo && k <= hi =>
                k -> ((v + 1000, w, e))
              case kept => kept
            }
            runSql(s"""UPDATE graft_evol_model SET v = v + 1000
              WHERE k BETWEEN $lo AND $hi""")
        }
        if (round == 3) { // compaction folds the width generations into
          // one dir under the union schema; content must not move
          runSql(s"OPTIMIZE '$root'")
        }
      }
      // lineage: the widenings are commits with named operations, and
      // v0 still time-travels to the narrow schema
      val ops = TableFormat.describe(spark, root)
        .collect().map(_.getString(7)).toSet
      assert(ops.contains("add-columns") && ops.contains("compact") &&
        ops.contains("alter-column-type"),
        s"operation labels: $ops")
      val v0 = spark.read.format(Provider).option("versionAsOf", "0")
        .load(root)
      assert(v0.columns.toSeq === Seq("k", "v"),
        "v0 must keep the narrow schema")
      assert(v0.schema("v").dataType ===
        org.apache.spark.sql.types.IntegerType,
        "v0 must keep the narrow TYPE (pre-widen manifest)")
      spark.sql("DROP TABLE IF EXISTS graft_evol_model")
    }
  }
}
