package graft

import java.sql.DriverManager

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.stream.Streaming

/** Live JDBC round-trip over embedded Apache Derby (ships in
  * /opt/spark/jars — zero new dependencies): the reference's first-listed
  * capability is the MySQL source/sink (reference `README.md:5`), and until
  * this spec the `jdbcRead`/`jdbcAppend` codepaths were trusted by
  * inspection only (round-5 VERDICT #2). Derby exercises the REAL Spark
  * JDBC machinery — DriverManager resolution, dialect type mapping,
  * partitioned range reads, batched appends, and the staging-upsert
  * pattern `foreachBatchUpsert` documents — against a genuine SQL engine.
  */
class JdbcSpec extends TestSpark {

  import spark.implicits._

  // one embedded database per suite run; Derby creates it on first connect
  private val dbPath = "/tmp/graft_derby_" + java.util.UUID.randomUUID()
  private val url = s"jdbc:derby:$dbPath;create=true"

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  test("jdbcRead splits a numeric range into partitioned parallel scans") {
    withConn { c =>
      val st = c.createStatement()
      st.execute(
        "CREATE TABLE src_clients (id BIGINT NOT NULL PRIMARY KEY, " +
          "name VARCHAR(64), bal DOUBLE)")
      val ps = c.prepareStatement("INSERT INTO src_clients VALUES (?, ?, ?)")
      (0 until 100).foreach { i =>
        ps.setLong(1, i.toLong)
        ps.setString(2, s"client#$i")
        ps.setDouble(3, i * 1.5)
        ps.addBatch()
      }
      ps.executeBatch()
    }
    val df = Sources.jdbcRead(spark, url, "src_clients",
      partitionColumn = "id", lowerBound = 0, upperBound = 100,
      numPartitions = 4)
    // the partitioned-read contract: 4 range scans, not one cursor
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 100)
    // dialect round-trip of values (Derby uppercases identifiers)
    val r = df.filter(col("ID") === 7).collect().head
    assert(r.getAs[String]("NAME") === "client#7")
    assert(r.getAs[Double]("BAL") === 10.5)
  }

  test("jdbcAppend batch-writes a frame and reads back identically") {
    val out = spark.range(50)
      .select(col("id"), concat(lit("p-"), col("id")).as("name"))
    Sources.jdbcAppend(out, url, "dst_people")
    val back = Sources.jdbcRead(spark, url, "dst_people",
      partitionColumn = "id", lowerBound = 0, upperBound = 50,
      numPartitions = 2)
    assert(back.count() === 50)
    // Spark's JDBC writer quotes identifiers, so the created columns are
    // case-sensitive lowercase (unlike the unquoted-DDL table above, which
    // Derby canonicalizes to uppercase)
    val pairs = back.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("name")).toMap
    assert(pairs(13L) === "p-13")
    // append again: mode is append, so the table accumulates (the
    // idempotent path is the staging upsert below, not plain append)
    Sources.jdbcAppend(out, url, "dst_people")
    assert(Sources.jdbcRead(spark, url, "dst_people", "id", 0, 50, 2)
      .count() === 100)
  }

  test("migrateAll bundle lands in Derby in FK order, FKs intact") {
    // the reference's actual deliverable: one run inserts all seven OpenMRS
    // tables over JDBC in FK dependency order (reference README.md:7-17).
    // migrateAll's Seq is already FK-ordered, so the write is a fold.
    val tables = graft.etl.Migration.migrateAll(spark, Sf)
    tables.foreach { case (name, df) => Sources.jdbcAppend(df, url, name) }
    def count(sql: String): Long = withConn { c =>
      val rs = c.createStatement().executeQuery(sql)
      rs.next(); rs.getLong(1)
    }
    val persons = count("SELECT COUNT(*) FROM person")
    assert(persons > 0)
    assert(count("SELECT COUNT(*) FROM person_attribute") === 3 * persons)
    Seq("person_name", "person_address", "patient", "patient_identifier",
      "dreams_client_patient_mapping").foreach(t =>
      assert(count(s"SELECT COUNT(*) FROM $t") === persons, s"count in $t"))
    // referential integrity AT THE SINK: no identifier row orphaned from
    // patient, no patient orphaned from person
    assert(count(
      """SELECT COUNT(*) FROM patient_identifier pi
        |LEFT JOIN patient p ON pi."patient_id" = p."patient_id"
        |WHERE p."patient_id" IS NULL""".stripMargin) === 0)
    assert(count(
      """SELECT COUNT(*) FROM patient p
        |LEFT JOIN person pe ON p."patient_id" = pe."person_id"
        |WHERE pe."person_id" IS NULL""".stripMargin) === 0)
  }

  test("foreachBatch staging upsert into Derby is idempotent across batches") {
    withConn { c =>
      c.createStatement().execute(
        "CREATE TABLE dst_events (event_id BIGINT NOT NULL PRIMARY KEY, " +
          "user_id BIGINT, value DOUBLE)")
    }
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Streaming.foreachBatchUpsert(
      mem.toDF().select(col("event_id"), col("user_id"), col("value"))) {
      (batch, batchId) =>
        // the documented staging-upsert shape: bulk-append the batch into a
        // per-batch staging table, then one set-based MERGE into the target
        // — the idempotent replacement for the reference's row-at-a-time
        // INSERT loop
        val staging = s"stage_$batchId"
        Sources.jdbcAppend(batch, url, staging)
        withConn { c =>
          c.createStatement().execute(
            // staging columns were created QUOTED by Spark's JDBC writer,
            // so they are case-sensitive lowercase and must be quoted here
            s"""MERGE INTO dst_events t
               |USING $staging s ON t.event_id = s."event_id"
               |WHEN MATCHED THEN UPDATE SET
               |  t.user_id = s."user_id", t.value = s."value"
               |WHEN NOT MATCHED THEN INSERT (event_id, user_id, value)
               |  VALUES (s."event_id", s."user_id", s."value")""".stripMargin)
          c.createStatement().execute(s"DROP TABLE $staging")
        }
    }.start()
    try {
      def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
      mem.addData(
        Ev(1, t(0), 10, "a", 1.0, "{}"),
        Ev(2, t(1), 11, "a", 2.0, "{}"),
        Ev(2, t(1), 11, "a", 2.0, "{}")) // in-batch duplicate
      q.processAllAvailable()
      // second batch REPLAYS event 2 (value updated) and adds event 3 —
      // the retry/overlap case the upsert exists for
      mem.addData(
        Ev(2, t(1), 11, "a", 20.0, "{}"),
        Ev(3, t(2), 12, "b", 3.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = withConn { c =>
      val rs = c.createStatement()
        .executeQuery("SELECT event_id, value FROM dst_events ORDER BY event_id")
      Iterator.continually(rs)
        .takeWhile(_.next()).map(r => (r.getLong(1), r.getDouble(2))).toList
    }
    assert(rows === List((1L, 1.0), (2L, 20.0), (3L, 3.0)))
  }

  test("streaming fuzzy dedup lands a standing index via staging MERGE, replay-safe") {
    // the full production loop the fuzzyDedupStream Scaladoc defers to the
    // sink: band hits → stateless per-doc fold (min owner over the 4
    // bands) → set-based MERGE into the standing dedup index — the
    // streaming continuation of q_dedup_incremental's standing-index shape
    implicit val sqlCtx = spark.sqlContext
    withConn(_.createStatement().execute(
      "CREATE TABLE dedup_index (doc_id BIGINT NOT NULL PRIMARY KEY, " +
        "owner BIGINT)"))
    def mergeFold(folded: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      val staging = s"fz_stage_$id"
      Sources.jdbcAppend(folded, url, staging)
      withConn { c =>
        c.createStatement().execute(
          s"""MERGE INTO dedup_index t USING $staging s
             |ON t.doc_id = s."doc_id"
             |WHEN MATCHED THEN UPDATE SET t.owner = s."owner"
             |WHEN NOT MATCHED THEN INSERT (doc_id, owner)
             |  VALUES (s."doc_id", s."owner")""".stripMargin)
        c.createStatement().execute(s"DROP TABLE $staging")
      }
    }
    val t1 = "the cat and the dog is in a tree by the old red barn"
    val t2 = "a fish of the sea is in the net under a big blue wave"
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = Streaming
      .fuzzyDedupStream(spark, mem.toDF().toDF("doc_id", "text", "ts"))
      .toDF()
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame,
          id: Long) =>
        if (!batch.isEmpty)
          mergeFold(batch.groupBy("doc_id")
            .agg(min(col("owner")).as("owner")), id)
      }.start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    try {
      mem.addData((1L, t1, t(0)), (2L, t2, t(0)))
      q.processAllAvailable()
      mem.addData((3L, t1 + " now", t(1))) // near-dup of doc 1
      q.processAllAvailable()
    } finally q.stop()
    def index(): List[(Long, Long)] = withConn { c =>
      val rs = c.createStatement()
        .executeQuery("SELECT doc_id, owner FROM dedup_index ORDER BY doc_id")
      Iterator.continually(rs)
        .takeWhile(_.next()).map(r => (r.getLong(1), r.getLong(2))).toList
    }
    val landed = index()
    assert(landed === List((1L, 1L), (2L, 2L), (3L, 1L)),
      s"standing index after two batches: $landed")
    // replay batch 2's fold verbatim — the MERGE must leave the index
    // unchanged (the retry/overlap case the staging upsert exists for)
    import spark.implicits._
    mergeFold(Seq((3L, 1L)).toDF("doc_id", "owner"), 99L)
    assert(index() === landed, "replayed batch must not change the index")
  }
}
