package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Streaming SOURCE over the snapshot table format
  * ([[graft.io.TableFormatSourceProvider]]): a stream follows the
  * manifest log — offsets are versions, batches are manifest diffs.
  * Owns the streaming contract SQL can't state: exactly-once delivery
  * across commits, the append-only guard against rewrite windows, and
  * row-level CDC delivery through merges and deletion-vector deletes.
  */
class TableFormatStreamSpec extends TestSpark {

  import graft.io.TableFormat

  private val Provider = classOf[graft.io.TableFormatSourceProvider].getName

  private def freshRoot(): String =
    Files.createTempDirectory("graft_tf_stream").toString

  test("appends mode follows commits exactly once; rewrites are refused") {
    import spark.implicits._
    val root = freshRoot()
    TableFormat.append(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), root,
      statsCol = Some("k"))
    val q = spark.readStream.format(Provider).load(root)
      .writeStream.format("memory").queryName("tfs_appends")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      def got: Set[(Long, String)] = spark.table("tfs_appends")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      // the initial batch is the current snapshot
      assert(got === Set((1L, "a"), (2L, "b")))
      // each append arrives exactly once, no replay of old dirs
      TableFormat.append(Seq((3L, "c")).toDF("k", "s"), root,
        statsCol = Some("k"))
      TableFormat.append(Seq((4L, "d")).toDF("k", "s"), root,
        statsCol = Some("k"))
      q.processAllAvailable()
      assert(got === Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
      // a rewrite commit must KILL an append-only stream loudly —
      // silently replaying the rewritten dir's rows as appends is how
      // downstream counts drift (the guard ignoreChanges=true waives)
      TableFormat.merge(spark, root, Seq((1L, "A")).toDF("k", "s"), "k",
        statsCol = Some("k"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(String.valueOf(e.getMessage).contains("append-only") ||
        Option(e.getCause).exists(c =>
          String.valueOf(c.getMessage).contains("append-only")),
        s"rewrite window not refused with the contract error: $e")
    } finally q.stop()
  }

  test("cdc mode streams the snapshot, then row-level changes") {
    import spark.implicits._
    val root = freshRoot()
    TableFormat.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"),
      root, statsCol = Some("k"))
    val q = spark.readStream.format(Provider)
      .option("mode", "cdc").option("keyCol", "k").load(root)
      .writeStream.format("memory").queryName("tfs_cdc")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      def got: Set[(Long, String, String)] = spark.table("tfs_cdc")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      // initial batch: the whole snapshot as inserts
      assert(got === Set((1L, "a", "insert"), (2L, "b", "insert"),
        (3L, "c", "insert")))
      // a merge streams both update images + the insert; a deletion-
      // vector delete streams the retraction — rewrites are fine here,
      // cdc consumers maintain state through them
      TableFormat.merge(spark, root, Seq((1L, "A"), (9L, "i")).toDF("k", "s"),
        "k", statsCol = Some("k"))
      TableFormat.deleteKeysMor(spark, root, Seq(2L).toDF("k"), "k")
      q.processAllAvailable()
      assert(got === Set(
        (1L, "a", "insert"), (2L, "b", "insert"), (3L, "c", "insert"),
        (1L, "a", "update_preimage"), (1L, "A", "update_postimage"),
        (9L, "i", "insert"), (2L, "b", "delete")))
    } finally q.stop()
  }

  test("a stream composes sink-to-source: follow a table another stream lands") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val base = Files.createTempDirectory("graft_tf_relay")
    val root = s"$base/table"
    val mem = MemoryStream[Long]
    // producer: exactly-once lands micro-batches as table commits
    val producer = mem.toDS().toDF("k").writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt_in")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.io.TableFormat.appendBatch(df, root, id); ()
      }.start()
    try {
      mem.addData(1L, 2L)
      producer.processAllAvailable()
      // consumer: a SECOND stream follows the same table through the
      // manifest log — two pipelines composed through the format, no
      // queue in between
      val consumer = spark.readStream.format(Provider).load(root)
        .groupBy().agg(count(lit(1)).as("n"), sum(col("k")).as("total"))
        .writeStream.format("memory").queryName("tfs_relay")
        .outputMode("complete").start()
      try {
        consumer.processAllAvailable()
        mem.addData(3L, 4L, 5L)
        producer.processAllAvailable()
        consumer.processAllAvailable()
        val r = spark.table("tfs_relay").collect()(0)
        assert((r.getLong(0), r.getLong(1)) === ((5L, 15L)),
          "relayed aggregate must see every landed row exactly once")
      } finally consumer.stop()
    } finally producer.stop()
  }
}
