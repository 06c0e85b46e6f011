package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ALTER COLUMN TYPE widening (r20 — `io/TableFormat.scala`
  * alterColumnType + the `GraftAlterColumnTypeCommand` SQL doorway):
  * a widen is a METADATA-ONLY schema commit — zero data I/O,
  * file-for-file entries — and readers promote old files' NARROWER
  * physical parquet type at scan time (the Spark 4 reader-side
  * widening). Pins: the zero-I/O contract, zone-map pruning across
  * the widen (bounds are recorded type-family-normalized), post-widen
  * DML with values only the wide type holds, time travel to the
  * narrow type, composition with column mapping (rename), the
  * decimal/float families, and the loud graft-owned refusals for
  * narrowing/cross-family changes. `q_table_sql_widen` carries the
  * value-level oracle.
  */
class WidenTypeSpec extends TestSpark {

  import graft.io.TableFormat

  private val Provider = classOf[graft.io.TableFormatSourceProvider].getName

  private def freshRoot(): String =
    Files.createTempDirectory("graft_widen").toString

  private def dataDirsOf(root: String): Set[String] = {
    val v = TableFormat.latestVersion(root)
    TableFormat.snapshotDirs(root, v).toSet
  }

  test("int→long widen is metadata-only: zero data I/O, values, " +
      "pruning, and time travel survive") {
    import spark.implicits._
    val root = freshRoot()
    TableFormat.append((0 until 50).map(i => (i, s"s$i")).toDF("k", "s"),
      root, statsCols = Seq("k"), ndvCols = Seq("k"))
    TableFormat.append((50 until 100).map(i => (i, s"s$i")).toDF("k", "s"),
      root, statsCols = Seq("k"), ndvCols = Seq("k"))
    val dirsBefore = dataDirsOf(root)
    val filesBefore = dirsBefore.flatMap(d =>
      Files.list(java.nio.file.Paths.get(d)).toArray.toSeq.map(_.toString))
    val v = TableFormat.alterColumnType(spark, root, "k", LongType)
    assert(dataDirsOf(root) === dirsBefore,
      "widen must carry every data dir verbatim")
    val filesAfter = dirsBefore.flatMap(d =>
      Files.list(java.nio.file.Paths.get(d)).toArray.toSeq.map(_.toString))
    assert(filesAfter === filesBefore, "widen must write zero data files")
    // the head reads LONG now — old INT32 files promote at scan time
    val head = TableFormat.readSnapshot(spark, root)
    assert(head.schema("k").dataType === LongType)
    assert(head.select(sum("k")).collect()(0).getLong(0) ===
      (0L until 100L).sum)
    // zone maps survive (bounds are kind-normalized): pruning still
    // skips the disjoint dir
    val kept = TableFormat.prunedDirs(root, v, Seq(("k", 0L, 10L)))
    assert(kept.size === 1, s"widened zone maps must keep pruning: $kept")
    // NDV sketches survive too
    val st = TableFormat.colStats(spark, root)
      .filter(col("column") === "k").collect()(0)
    assert(!st.isNullAt(1) && st.getLong(1) > 80,
      s"NDV sketch must survive the widen: $st")
    // time travel reads the NARROW type from its own manifest
    assert(TableFormat.readSnapshot(spark, root, v - 1)
      .schema("k").dataType === IntegerType)
  }

  test("post-widen DML lands values only the wide type holds; mixed " +
      "narrow/wide files read as one table") {
    import spark.implicits._
    val root = freshRoot()
    TableFormat.append((0 until 40).map(i => (i, i * 10L)).toDF("k", "v"),
      root, statsCols = Seq("k"))
    TableFormat.alterColumnType(spark, root, "k", LongType)
    val big = Int.MaxValue.toLong + 7L
    // append beyond Int range: the new file is physically wide
    TableFormat.append(Seq((big, 999L)).toDF("k", "v"),
      root, statsCols = Seq("k"))
    val all = TableFormat.readSnapshot(spark, root)
    assert(all.count() === 41)
    assert(all.filter(col("k") === big).count() === 1)
    // key-pruned delete on the widened key touches only its dir
    TableFormat.deleteKeys(spark, root, Seq(big).toDF("k"), "k",
      statsCols = Seq("k"))
    assert(TableFormat.readSnapshot(spark, root).count() === 40)
    // updateWhere across the widen boundary
    TableFormat.updateWhere(spark, root, col("k") === 7L,
      Seq("v" -> lit(-1L)), statsCols = Seq("k"))
    assert(TableFormat.readSnapshot(spark, root)
      .filter(col("v") === -1L).select("k").collect()(0).getLong(0) === 7L)
  }

  test("float→double, int→double (hist drops), and decimal widening") {
    import spark.implicits._
    val root = freshRoot()
    val df = spark.range(20).select(
      col("id").cast(IntegerType).as("i"),
      col("id").cast(FloatType).as("f"),
      col("id").cast(DecimalType(9, 2)).as("d"))
    TableFormat.append(df, root, statsCols = Seq("i"),
      histCols = Seq("i"))
    assert(TableFormat.readManifestFull(root,
      TableFormat.latestVersion(root)).entries.exists(_.hist.contains("i")))
    TableFormat.alterColumnType(spark, root, "f", DoubleType)
    TableFormat.alterColumnType(spark, root, "d", DecimalType(20, 4))
    val h1 = TableFormat.readSnapshot(spark, root)
    assert(h1.schema("f").dataType === DoubleType)
    assert(h1.schema("d").dataType === DecimalType(20, 4))
    assert(h1.select(sum("f")).collect()(0).getDouble(0) === 190.0)
    assert(h1.select(sum("d")).collect()(0).getDecimal(0)
      .compareTo(new java.math.BigDecimal("190.0000")) === 0)
    // int→double LEAVES the integral family: the long-keyed histogram
    // buckets would feed the estimator a stale domain — they drop
    TableFormat.alterColumnType(spark, root, "i", DoubleType)
    val m = TableFormat.readManifestFull(root,
      TableFormat.latestVersion(root))
    assert(!m.entries.exists(_.hist.contains("i")),
      "int→double must drop the integral histogram")
    assert(TableFormat.readSnapshot(spark, root)
      .select(sum("i")).collect()(0).getDouble(0) === 190.0)
  }

  test("widen composes with column mapping: a renamed column widens " +
      "under its stable physical spelling") {
    import spark.implicits._
    val root = freshRoot()
    TableFormat.append((0 until 30).map(i => (i, s"s$i")).toDF("k", "s"),
      root, statsCols = Seq("k"))
    TableFormat.renameColumn(spark, root, "k", "id")
    TableFormat.alterColumnType(spark, root, "id", LongType)
    val big = Int.MaxValue.toLong + 1L
    TableFormat.append(Seq((big, "wide")).toDF("id", "s"),
      root, statsCols = Seq("id"))
    val got = TableFormat.readSnapshot(spark, root)
    assert(got.schema("id").dataType === LongType)
    assert(got.filter(col("id") === big).select("s")
      .collect()(0).getString(0) === "wide")
    assert(got.select(sum("id")).collect()(0).getLong(0) ===
      (0L until 30L).sum + big)
  }

  test("NDV registers stay consistent across a hash-stable widen and " +
      "drop on a hash-unstable one") {
    import spark.implicits._
    val root = freshRoot()
    // 100 distinct int values, sketched
    TableFormat.append((0 until 100).map(i => (i, i)).toDF("k", "d"),
      root, statsCols = Seq("k"), ndvCols = Seq("k", "d"))
    TableFormat.alterColumnType(spark, root, "k", LongType)
    // the SAME 100 values land again post-widen as longs: xxhash64 is
    // type-dependent, so without the canonical LONG hash domain the
    // merged registers would double-count to ~200
    TableFormat.append((0L until 100L).map(i => (i, i.toInt)).toDF("k", "d"),
      root, statsCols = Seq("k"), ndvCols = Seq("k", "d"))
    val st = TableFormat.colStats(spark, root)
      .filter(col("column") === "k").collect()(0)
    assert(!st.isNullAt(1) && st.getLong(1) < 130,
      s"NDV across an int→long widen must not double-count: $st")
    // int→double leaves the hash domain: the account drops sound-first
    TableFormat.alterColumnType(spark, root, "d", DoubleType)
    val m = TableFormat.readManifestFull(root,
      TableFormat.latestVersion(root))
    assert(!m.entries.exists(_.ndv.contains("d")),
      "a hash-unstable widen must drop the NDV registers")
    assert(m.entries.forall(_.ndv.contains("k")),
      "the hash-stable widen must keep them")
  }

  test("refusals are loud and graft-owned: narrowing, cross-family, " +
      "long→double, decimal narrowing") {
    import spark.implicits._
    val root = freshRoot()
    TableFormat.append(Seq((1L, "a", java.math.BigDecimal.valueOf(1.5)))
      .toDF("k", "s", "d")
      .select(col("k"), col("s"), col("d").cast(DecimalType(10, 2)).as("d")),
      root, statsCols = Seq("k"))
    def refuses(c: String, t: DataType): Unit = {
      val e = intercept[IllegalArgumentException] {
        TableFormat.alterColumnType(spark, root, c, t)
      }
      assert(e.getMessage.contains("WIDEN"),
        s"$c -> $t must refuse with the graft message: ${e.getMessage}")
    }
    refuses("k", IntegerType)          // narrowing
    refuses("k", StringType)           // cross-family
    refuses("k", DoubleType)           // long→double loses precision
    refuses("s", LongType)             // string→long
    refuses("d", DecimalType(10, 1))   // decimal scale narrowing
    refuses("d", DecimalType(9, 2))    // decimal precision narrowing
  }

  test("SQL doorway: ALTER TABLE … ALTER COLUMN TYPE end-to-end, " +
      "catalog realigned, post-widen INSERT beyond the narrow range") {
    import spark.implicits._
    val root = freshRoot()
    spark.sql("DROP TABLE IF EXISTS graft_widen_t")
    spark.sql(s"""CREATE TABLE graft_widen_t (k INT, v BIGINT)
      USING `$Provider` OPTIONS (path '$root/t', statsCols 'k')""")
    spark.sql("INSERT INTO graft_widen_t SELECT id, id * 2 FROM range(0, 20)")
    val dirsBefore = dataDirsOf(s"$root/t")
    spark.sql("ALTER TABLE graft_widen_t ALTER COLUMN k TYPE BIGINT")
    assert(dataDirsOf(s"$root/t") === dirsBefore,
      "the SQL widen must be metadata-only")
    // catalog realigned
    val cat = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("graft_widen_t"))
    assert(cat.dataSchema("k").dataType === LongType)
    // INSERT a value only BIGINT holds, then DML across the boundary
    val big = Int.MaxValue.toLong + 123L
    spark.sql(s"INSERT INTO graft_widen_t VALUES ($big, 1)")
    spark.sql(s"UPDATE graft_widen_t SET v = -5 WHERE k = $big")
    spark.sql("DELETE FROM graft_widen_t WHERE k = 3")
    val got = spark.sql(
      "SELECT count(*) AS n, sum(k) AS sk, sum(v) AS sv " +
        "FROM graft_widen_t").collect()(0)
    assert(got.getLong(0) === 20)
    assert(got.getLong(1) === (0L until 20L).sum - 3L + big)
    assert(got.getLong(2) === (0L until 20L).map(_ * 2).sum - 6L - 5L)
    // a narrowing through SQL refuses with the graft message
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft_widen_t ALTER COLUMN v TYPE INT")
    }
    assert(e.getMessage.contains("WIDEN"), e.getMessage)
    spark.sql("DROP TABLE graft_widen_t")
  }

  test("non-graft v1 tables refuse ALTER COLUMN TYPE with a loud " +
      "provider error") {
    val dir = Files.createTempDirectory("graft_widen_pq").toString
    spark.sql("DROP TABLE IF EXISTS graft_widen_pq")
    spark.sql(s"""CREATE TABLE graft_widen_pq (k INT)
      USING parquet OPTIONS (path '$dir/t')""")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft_widen_pq ALTER COLUMN k TYPE BIGINT")
    }
    assert(e.getMessage.contains("provider"), e.getMessage)
    spark.sql("DROP TABLE graft_widen_pq")
  }
}
