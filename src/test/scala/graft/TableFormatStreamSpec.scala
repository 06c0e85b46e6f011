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

  test("startingVersion skips the snapshot batch; the first window is (v, head]") {
    import spark.implicits._
    val root = freshRoot()
    TableFormat.append(Seq((1L, "a"), (2L, "b")).toDF("k", "s"),
      root, statsCol = Some("k")) // v0 — declared already-held
    TableFormat.append(Seq((3L, "c")).toDF("k", "s"),
      root, statsCol = Some("k")) // v1 — must stream
    val q = spark.readStream.format(Provider)
      .option("mode", "cdc").option("keyCol", "k")
      .option("startingVersion", "0").load(root)
      .writeStream.format("memory").queryName("tfs_sv")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      def got: Set[(Long, String, String)] = spark.table("tfs_sv")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got === Set((3L, "c", "insert")),
        "the held snapshot's rows must NOT replay as the initial batch")
      // later commits flow normally
      TableFormat.deleteKeysMor(spark, root, Seq(1L).toDF("k"), "k")
      q.processAllAvailable()
      assert(got === Set((3L, "c", "insert"), (1L, "a", "delete")))
    } finally q.stop()
    // the effective startingVersion PERSISTS in the source-metadata dir
    // (round-16 ADVICE #3): a changed/dropped option under an existing
    // checkpoint must not re-window the replay of the first committed
    // batch — observable through the admission baseline: with
    // maxVersionsPerTrigger=1 over a 3-version table, a fresh source
    // seeded at the persisted v0 offers offset 1, while the stale code
    // would offer 0 (option dropped) or 2 (option moved later)
    locally {
      val root3 = freshRoot()
      for (i <- 0 until 3)
        TableFormat.append(Seq((10L + i, s"v$i")).toDF("k", "s"), root3,
          statsCol = Some("k"))
      val meta = java.nio.file.Files
        .createTempDirectory("graft_sv_meta").toString
      val cdcSchema = org.apache.spark.sql.types.StructType(
        TableFormat.readSnapshot(spark, root3).schema.fields :+
          org.apache.spark.sql.types.StructField("change_type",
            org.apache.spark.sql.types.StringType))
      def mkSource(params: Map[String, String]) =
        new graft.io.TableFormatStreamSource(spark.sqlContext, root3,
          params ++ Map("mode" -> "cdc", "keyCol" -> "k",
            "maxVersionsPerTrigger" -> "1"),
          cdcSchema, metadataPath = Some(meta))
      def off(s: graft.io.TableFormatStreamSource): Long =
        s.getOffset.get.json.trim.toLong
      assert(off(mkSource(Map("startingVersion" -> "0"))) === 1L)
      assert(off(mkSource(Map.empty)) === 1L,
        "dropped startingVersion must not re-window: persisted v0 rules")
      assert(off(mkSource(Map("startingVersion" -> "2"))) === 1L,
        "moved startingVersion must not skip the committed window")
    }

    // startingVersion == head: the declared-empty first window is not
    // an error, and the stream picks up strictly-later commits
    val root2 = freshRoot()
    TableFormat.append(Seq((1L, "x")).toDF("k", "s"), root2,
      statsCol = Some("k"))
    val q2 = spark.readStream.format(Provider)
      .option("mode", "cdc").option("keyCol", "k")
      .option("startingVersion",
        TableFormat.latestVersion(root2).toString).load(root2)
      .writeStream.format("memory").queryName("tfs_sv2")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      assert(spark.table("tfs_sv2").count() === 0)
      TableFormat.append(Seq((2L, "y")).toDF("k", "s"), root2,
        statsCol = Some("k"))
      q2.processAllAvailable()
      assert(spark.table("tfs_sv2").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet ===
        Set((2L, "y", "insert")))
    } finally q2.stop()
  }

  test("maxVersionsPerTrigger drains a backlog in bounded batches, exactly once") {
    import spark.implicits._
    val root = freshRoot()
    // a paused consumer's backlog: 6 committed versions before any trigger
    for (i <- 0L to 5L)
      TableFormat.append(Seq(i).toDF("k"), root, statsCol = Some("k"))
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[Long])]
    val base = Files.createTempDirectory("graft_tf_cap")
    def start() = spark.readStream.format(Provider)
      .option("maxVersionsPerTrigger", "2").load(root)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.synchronized {
          batches += ((id, df.collect().map(_.getLong(0)).toSet)) }; ()
      }.start()
    val q = start()
    try {
      q.processAllAvailable()
      // admission math: baseline -1 → offsets 1, 3, 5 → ceil(6/2) = 3
      // batches, and every row exactly once across them
      assert(batches.map(_._1).toSeq === Seq(0L, 1L, 2L),
        s"6-version backlog at cap 2 must drain in 3 batches: $batches")
      assert(batches.flatMap(_._2).toSet === (0L to 5L).toSet &&
        batches.map(_._2.size).sum === 6,
        s"capped drain lost or duplicated rows: $batches")
    } finally q.stop()
    // restart mid-history: 3 more versions land while stopped; the
    // resumed stream re-seeds its admission baseline from the checkpoint
    // and drains the new backlog in ceil(3/2) = 2 batches, no replay
    for (i <- 6L to 8L)
      TableFormat.append(Seq(i).toDF("k"), root, statsCol = Some("k"))
    val n0 = batches.size
    val q2 = start()
    try {
      q2.processAllAvailable()
      val fresh = batches.drop(n0)
      assert(fresh.map(_._1).toSeq === Seq(3L, 4L),
        s"restarted drain must continue the batch sequence capped: $fresh")
      assert(fresh.flatMap(_._2).toSet === (6L to 8L).toSet &&
        fresh.map(_._2.size).sum === 3,
        s"restarted capped drain lost or duplicated rows: $fresh")
    } finally q2.stop()
  }

  test("Trigger.AvailableNow: uncapped runs drain fully; capped runs converge") {
    import spark.implicits._
    val root = freshRoot()
    for (i <- 0L to 4L)
      TableFormat.append(Seq(i).toDF("k"), root, statsCol = Some("k"))
    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val base = Files.createTempDirectory("graft_tf_availnow")
    def run(cap: Option[Int]): Unit = {
      val rd = spark.readStream.format(Provider)
      val q = cap.foldLeft(rd)((r, c) =>
        r.option("maxVersionsPerTrigger", c.toString)).load(root)
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          batches.synchronized {
            batches += df.collect().map(_.getLong(0)).toSet }; ()
        }.start()
      assert(q.awaitTermination(120000),
        "AvailableNow must terminate on its own")
    }
    // uncapped: one run-to-completion invocation consumes the whole
    // backlog in one batch (a deliberate batch invocation)
    run(cap = None)
    assert(batches.flatMap(identity).toSet === (0L to 4L).toSet &&
      batches.map(_.size).sum === 5,
      s"uncapped AvailableNow drain lost or duplicated rows: $batches")
    // capped (r19 — the source implements SupportsTriggerAvailableNow,
    // the Delta contract): ONE run drains the whole backlog observed at
    // start in ceil(M/cap) BOUNDED batches, then terminates on its own
    for (i <- 5L to 8L)
      TableFormat.append(Seq(i).toDF("k"), root, statsCol = Some("k"))
    val n0 = batches.size
    run(cap = Some(2))
    val drained = batches.drop(n0)
    assert(drained.flatMap(identity).toSet === Set(5L, 6L, 7L, 8L),
      s"one capped AvailableNow run must drain the full backlog: $drained")
    assert(drained.size === 2 && drained.forall(_.size === 2),
      s"a 4-version backlog at cap 2 drains in 2 bounded batches: " +
        drained.map(_.size))
    assert(batches.flatMap(identity).toSet === (0L to 8L).toSet &&
      batches.map(_.size).sum === 9,
      "capped AvailableNow drain lost or duplicated rows")
    // a re-run against a drained head terminates with no new batches
    val n1 = batches.size
    run(cap = Some(2))
    assert(batches.drop(n1).forall(_.isEmpty),
      s"a drained head must yield no rows: ${batches.drop(n1)}")
  }

  test("AvailableNow: exactly-once across a restart mid-drain") {
    import spark.implicits._
    val root = freshRoot()
    for (i <- 0L to 5L)
      TableFormat.append(Seq(i).toDF("k"), root, statsCol = Some("k"))
    val base = Files.createTempDirectory("graft_tf_availrestart")
    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    // first run: kill the query after the FIRST batch lands — a crash
    // mid-drain; the checkpoint holds the committed offset
    val killed = new java.util.concurrent.atomic.AtomicReference[
      org.apache.spark.sql.streaming.StreamingQuery]()
    val q1 = spark.readStream.format(Provider)
      .option("maxVersionsPerTrigger", "2").load(root)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized {
          batches += df.collect().map(_.getLong(0)).toSet }
        // stop after the first non-empty batch — from a separate thread
        // (stop() from inside foreachBatch deadlocks the micro-batch)
        val me = killed.get()
        if (me != null && batches.synchronized(batches.size) == 1) {
          new Thread(() => me.stop()).start()
        }
        ()
      }.start()
    killed.set(q1)
    q1.awaitTermination(120000)
    assert(batches.size <= 2,
      s"the kill must land mid-drain, got ${batches.size} batches")
    val afterCrash = batches.size
    // second run: resumes from the checkpoint, drains the REMAINDER in
    // bounded batches, terminates — nothing lost, nothing doubled
    val q2 = spark.readStream.format(Provider)
      .option("maxVersionsPerTrigger", "2").load(root)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized {
          batches += df.collect().map(_.getLong(0)).toSet }; ()
      }.start()
    assert(q2.awaitTermination(120000),
      "the resumed AvailableNow run must terminate on its own")
    val all = batches.synchronized(batches.toList)
    // exactly-once: a batch REPLAYED after the crash may legitimately
    // re-run (foreachBatch redelivery), but the committed row multiset
    // must cover 0..5 exactly once per the sink's dedup window — here
    // the replay re-delivers the SAME batch id, so distinct batch sets
    // must union to the full range with no row in two different sets
    assert(all.flatMap(identity).toSet === (0L to 5L).toSet,
      s"restart mid-drain lost rows: $all")
    assert(all.drop(afterCrash).forall(_.size <= 2),
      s"resumed batches must stay bounded by the cap: $all")
  }

  test("maxBytesPerTrigger prices admission from the manifest size accounts") {
    import spark.implicits._
    val root = freshRoot()
    // 5 committed versions, each a few KB — a 1-byte budget admits
    // exactly one version per trigger (the progress guarantee), so the
    // backlog drains version-by-version with no file listing involved
    for (i <- 0L to 4L)
      TableFormat.append(Seq(i).toDF("k"), root, statsCol = Some("k"))
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[Long])]
    val base = Files.createTempDirectory("graft_tf_bytes")
    val q = spark.readStream.format(Provider)
      .option("maxBytesPerTrigger", "1").load(root)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.synchronized {
          batches += ((id, df.collect().map(_.getLong(0)).toSet)) }; ()
      }.start()
    try {
      q.processAllAvailable()
      assert(batches.map(_._1).toSeq === (0L to 4L),
        s"a 1-byte budget must admit one version per trigger: $batches")
      assert(batches.map(_._2).toSeq === (0L to 4L).map(Set(_)),
        s"byte-capped drain delivered wrong rows: $batches")
    } finally q.stop()
  }

  test("the rewrite guard still refuses inside a capped window") {
    import spark.implicits._
    val root = freshRoot()
    TableFormat.append(Seq((1L, "a")).toDF("k", "s"), root,
      statsCol = Some("k"))
    TableFormat.append(Seq((2L, "b")).toDF("k", "s"), root,
      statsCol = Some("k"))
    // v2 is a rewrite: the capped second window (v1, v2] contains it
    TableFormat.merge(spark, root, Seq((1L, "A")).toDF("k", "s"), "k",
      statsCol = Some("k"))
    val q = spark.readStream.format(Provider)
      .option("maxVersionsPerTrigger", "2").load(root)
      .writeStream.format("memory").queryName("tfs_cap_guard")
      .outputMode("append").start()
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(String.valueOf(e.getMessage).contains("append-only") ||
        Option(e.getCause).exists(c =>
          String.valueOf(c.getMessage).contains("append-only")),
        s"capped window over a rewrite must refuse with the contract error: $e")
    } finally q.stop()
  }

  test("follower refs floor retention; an unregistered consumer strands loudly") {
    import spark.implicits._
    val root = freshRoot()
    for (i <- 0L to 4L)
      TableFormat.append(Seq(i).toDF("k"), root, statsCol = Some("k"))
    val base = Files.createTempDirectory("graft_tf_follow")
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    def start() = spark.readStream.format(Provider)
      .option("followerId", "mv-refresher").load(root)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen ++= df.collect().map(_.getLong(0)) }; ()
      }.start()
    // a follower that consumed through v4 and registered itself; the
    // floor publishes on the NEXT batch (plan-time `from` / lazy engine
    // commit), so land one more version and trigger again
    val q = start()
    try {
      q.processAllAvailable()
      TableFormat.append(Seq(5L).toDF("k"), root, statsCol = Some("k"))
      q.processAllAvailable()
    } finally q.stop()
    val floor = TableFormat.followers(root)
      .getOrElse("mv-refresher", fail("follower floor never published"))
    assert(floor >= 4, s"floor must cover the committed batch, got $floor")
    // retention with keepLast=1 would drop everything below the head —
    // the follower floor protects its resume point and everything after
    TableFormat.append(Seq(9L).toDF("k"), root, statsCol = Some("k"))
    assert(TableFormat.expire(root, keepLast = 1) === (0 until floor),
      "expire must refuse to cross the slowest follower's floor")
    // the protected follower resumes across the expiry without error and
    // sees exactly the not-yet-consumed rows
    val n0 = seen.size
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(seen.drop(n0).toSet === Set(9L),
      "resumed follower must see exactly the post-floor rows")
    // the STRANDED path: an unregistered consumer whose offset aged out
    // fails with the recovery named, never a silent gap
    val root2 = freshRoot()
    for (i <- 0L to 3L)
      TableFormat.append(Seq(i).toDF("k"), root2, statsCol = Some("k"))
    val base2 = Files.createTempDirectory("graft_tf_strand")
    def startUnregistered() = spark.readStream.format(Provider).load(root2)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base2/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect(); ()
      }.start()
    val q3 = startUnregistered()
    try q3.processAllAvailable() finally q3.stop()
    TableFormat.append(Seq(9L).toDF("k"), root2, statsCol = Some("k"))
    TableFormat.expire(root2, keepLast = 1) // drops v0..v3: offset gone
    val q4 = startUnregistered()
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q4.processAllAvailable()
      }
      def m(t: Throwable) = String.valueOf(t.getMessage)
      assert(m(e).contains("STRANDED") ||
        Option(e.getCause).exists(c => m(c).contains("STRANDED")),
        s"expired-offset resume must fail with the stranded contract error: $e")
    } finally q4.stop()
  }

  test("the provider sink lands exactly-once commits, zero custom code") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val base = Files.createTempDirectory("graft_tf_sink")
    val root = s"$base/table"
    val mem = MemoryStream[Long]
    def start() = mem.toDS().toDF("k").writeStream
      .format(Provider).outputMode("append")
      .option("path", root).option("statsCols", "k")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    val q = start()
    try {
      mem.addData(1L, 2L)
      q.processAllAvailable()
      mem.addData(3L)
      q.processAllAvailable()
    } finally q.stop()
    def keys: Set[Long] = TableFormat.readSnapshot(spark, root)
      .collect().map(_.getLong(0)).toSet
    assert(keys === Set(1L, 2L, 3L))
    // the sink records zone maps like any hand-landed commit
    assert(TableFormat.prunedDirs(root, TableFormat.latestVersion(root),
      Seq(("k", Long.box(100L), Long.box(200L)))).isEmpty,
      "sink-landed commits lost their zone maps")
    // restart on the same checkpoint: replayed batches skip on the txn
    // marker — no doubles (appendBatch's exactly-once, through the sink)
    val q2 = start()
    try {
      mem.addData(4L)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(keys === Set(1L, 2L, 3L, 4L),
      "restarted provider sink doubled or lost a batch")
    // non-append output modes refuse: each batch is an append commit
    val e = intercept[Exception] {
      mem.toDS().toDF("k").groupBy().count().writeStream
        .format(Provider).outputMode("complete")
        .option("path", s"$base/t2")
        .option("checkpointLocation", s"$base/ckpt2").start()
    }
    assert(String.valueOf(e.getMessage).contains("append-only") ||
      Option(e.getCause).exists(c =>
        String.valueOf(c.getMessage).contains("append-only")),
      s"non-append mode must refuse with the contract error: $e")
  }

  test("sink auto-compact bounds the manifest under a trickle of tiny batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val base = Files.createTempDirectory("graft_tf_autocompact")
    val root = s"$base/table"
    val mem = MemoryStream[Long]
    val q = mem.toDS().toDF("k").writeStream
      .format(Provider).outputMode("append")
      .option("path", root).option("statsCols", "k")
      .option("autoCompactMinBytes", (1L << 20).toString)
      .option("autoCompactMinDirs", "4")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try {
      // 12 one-row triggers: without auto-compact the head would carry
      // 12 KB-sized dirs; with it, each 4th landing folds the tail
      (0L until 12L).foreach { k =>
        mem.addData(k)
        q.processAllAvailable()
      }
    } finally q.stop()
    val head = TableFormat.latestVersion(root)
    val m = TableFormat.readManifestFull(root, head)
    assert(m.entries.size < 6,
      s"auto-compact left ${m.entries.size} dirs after 12 tiny batches: " +
        m.entries.map(_.dir))
    // compaction must not cost rows, accounts, or exactly-once-ness
    assert(TableFormat.readSnapshot(spark, root)
      .collect().map(_.getLong(0)).toSet === (0L until 12L).toSet,
      "auto-compact lost or doubled rows")
    assert(TableFormat.countRows(spark, root) === 12)
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
