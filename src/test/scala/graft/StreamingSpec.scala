package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.stream.Streaming

/** Top-level fixture row: Dataset encoders cannot be generated for
  * classes nested inside the suite (no outer-scope access at runtime).
  */
final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Structured Streaming specs (SURVEY.md §5.2): the streaming versions of
  * the windowed transforms produce the batch twin's results; watermark
  * dedup and custom keyed state behave as specified.
  */
class StreamingSpec extends TestSpark {

  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

  private val fixture = Seq(
    Ev(0, ts(0), 1, "signup", 10.0, "{}"),
    Ev(1, ts(4), 1, "purchase", 20.0, "{}"),
    Ev(2, ts(11), 2, "signup", 5.0, "{}"),
    Ev(3, ts(12), 1, "purchase", 20.0, "{}"),
    Ev(4, ts(25), 2, "purchase", 7.5, "{}"),
    Ev(5, ts(59), 1, "error", 1.25, "{}"))

  test("streaming tumbling agg == batch twin on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(fixture: _*)
    val q = Streaming.tumblingStream(mem.toDF())
      .writeStream.format("memory").queryName("tumble_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("tumble_out")
      .orderBy("bucket_start").collect().toSeq
    // same approx-distinct variant on the batch side (exact countDistinct is
    // a streaming-unsupported op — the oracle twin keeps it, batch-only)
    val batch = Streaming.tumbling(fixture.toDF(), exactDistinct = false)
      .orderBy("bucket_start").collect().toSeq
    assert(streamed === batch)
  }

  test("watermark drops events later than the threshold (R4)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Streaming.tumblingStream(mem.toDF())
      .writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    try {
      // watermark horizon is 10 min; an event at t=30min advances the
      // watermark to 20min, closing (and emitting) the [0,10) window
      mem.addData(Ev(0, ts(0), 1, "a", 1.0, "{}"),
        Ev(1, ts(30), 1, "a", 1.0, "{}"))
      q.processAllAvailable()
      // t=5min is far behind the 20min watermark -> must be dropped
      mem.addData(Ev(2, ts(5), 1, "late", 99.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()
    val bucket0 = spark.table("wm_out")
      .filter($"bucket_start" === Timestamp.valueOf("2024-01-01 00:00:00")
        .getTime / 1000)
      .collect()
    assert(bucket0.length === 1, s"window re-emitted: ${bucket0.toSeq}")
    assert(bucket0.head.getAs[Long]("n_events") === 1L,
      "late event leaked into the closed window")
  }

  test("dropDuplicatesWithinWatermark removes in-horizon duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // same (user, type) twice within the watermark window
    mem.addData(fixture :+ Ev(6, ts(5), 1, "purchase", 99.0, "{}"): _*)
    val q = Streaming.dedupStream(mem.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val out = spark.table("dedup_out")
    assert(out.groupBy("user_id", "event_type").count()
      .filter($"count" > 1).count() === 0)
  }

  test("streaming fuzzy dedup: owners fold to the earliest doc, idle buckets evict") {
    implicit val sqlCtx = spark.sqlContext
    val t1 = "the cat and the dog is in a tree by the old red barn"
    val t1n = t1 + " now" // near-dup: shares all but the last shingle
    val t2 = "a fish of the sea is in the net under a big blue wave"
    // ground truth from the SHARED banding kernel: the near-dup pair must
    // actually land in a common LSH bucket, or the fixture proves nothing
    val bands = graft.ops.Dedup.bandRowsFromText(
      Seq((1L, t1), (3L, t1n)).toDF("doc_id", "text"), Nil)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getString(2))))
    assert(bands.filter(_._1 == 1L).map(_._2).toSet
      .intersect(bands.filter(_._1 == 3L).map(_._2).toSet).nonEmpty,
      "fixture must plant a shared LSH bucket")

    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = Streaming
      .fuzzyDedupStream(spark, mem.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("fuzzy_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, t1, ts(0)), (2L, t2, ts(0)))
      q.processAllAvailable()
      // in-horizon near-dup: doc 3 must hit doc 1's bucket
      mem.addData((3L, t1n, ts(1)))
      q.processAllAvailable()
      // jump event time 4 h ahead (watermark follows at batch end), then a
      // data-bearing sweep batch fires the expired bucket timers
      mem.addData((9L, t2, ts(240)))
      q.processAllAvailable()
      mem.addData((8L, t2, ts(241)))
      q.processAllAvailable()
      // doc 1's text returns AFTER its buckets were evicted: novel again
      mem.addData((10L, t1, ts(242)))
      q.processAllAvailable()
    } finally q.stop()

    val owner = spark.table("fuzzy_out")
      .groupBy("doc_id").agg(min($"owner").as("o")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(owner(1L) === 1L, "first doc owns its buckets")
    assert(owner(2L) === 2L, "unrelated doc is novel")
    assert(owner(3L) === 1L, "near-dup resolves to the earlier doc")
    assert(owner(9L) === 2L, "doc 2's buckets still live at the jump")
    assert(owner(8L) === 2L, "activity keeps a bucket's owner")
    assert(owner(10L) === 10L,
      "post-eviction repeat is novel — state horizon is bounded")
  }

  test("streaming fuzzy dedup == the batch owner query when docs arrive in id order") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // feed the WHOLE sf0.001 corpus through the stream in doc_id order
    // within one watermark horizon: the per-bucket state fold must produce
    // exactly the batch q_dedup_owner frame — the oracle-verified batch
    // twin of the stream semantics
    val docs = graft.io.Sources.table(spark, Sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
      .map { case (id, text) =>
        (id, text, java.sql.Timestamp.valueOf("2024-01-01 00:00:01")) }
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = Streaming
      .fuzzyDedupStream(spark, mem.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("fz_batch_eq")
      .outputMode("append").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("fz_batch_eq")
      .groupBy("doc_id").agg(min($"owner").as("owner"))
    val batch = graft.SparkEntry.queries("q_dedup_owner")(spark, Sf)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("streaming fuzzy dedup: out-of-order arrival is detectable as owner > doc_id") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the BandHit contract: in-order feeds equal the batch twin; a SMALLER
    // doc_id arriving after its near-dup emits owner > doc_id ("dup of a
    // later-id doc") rather than silently posing as novel
    val t = "the cat and the dog is in a tree by the old red barn"
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = Streaming
      .fuzzyDedupStream(spark, mem.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("fz_ooo")
      .outputMode("append").start()
    try {
      mem.addData((10L, t, ts(0)))
      q.processAllAvailable()
      mem.addData((5L, t, ts(1)))
      q.processAllAvailable()
    } finally q.stop()
    val owners = spark.table("fz_ooo")
      .groupBy("doc_id").agg(min($"owner").as("o")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(owners(10L) === 10L, "first arrival is novel")
    assert(owners(5L) === 10L,
      "late smaller doc must surface its bucket's standing owner (> doc_id)")
  }

  test("streaming fuzzy dedup survives a checkpointed restart (kill + resume)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // The 24/7 crawl contract: the standing per-bucket owner state must
    // survive a query restart. Feed the first half of the corpus, STOP the
    // query (a crash stand-in), restart from the SAME checkpoint, feed the
    // rest — novelty decisions for second-half docs depend on FIRST-half
    // state (13 cross-half owner pairs exist at this SF), so the union of
    // the two runs' append output equals the oracle-verified batch twin
    // only if the state actually came back.
    val docs = graft.io.Sources.table(spark, Sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
      .map { case (id, text) =>
        (id, text, java.sql.Timestamp.valueOf("2024-01-01 00:00:01")) }
    val (firstHalf, secondHalf) = docs.splitAt(docs.length / 2)
    val split = secondHalf.head._1
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fz_ckpt")
      .toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_fz_out")
      .toString
    val mem = MemoryStream[(Long, String, Timestamp)]
    val stream = mem.toDF().toDF("doc_id", "text", "ts")
    // the memory sink refuses checkpoint recovery by design — land batches
    // through foreachBatch + parquet append, the production sink shape
    // ([[Streaming.foreachBatchUpsert]]); the min-owner fold below is
    // idempotent, so a replayed boundary batch cannot skew the compare
    def start() = Streaming.fuzzyDedupStream(spark, stream)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch((b: org.apache.spark.sql.Dataset[Streaming.BandHit],
          _: Long) => b.toDF().write.mode("append").parquet(outDir))
      .start()
    val q1 = start()
    try {
      mem.addData(firstHalf: _*)
      q1.processAllAvailable()
    } finally q1.stop()
    // restart against the same checkpoint: offsets resume past the
    // committed first half, state restores from the HDFS state store
    mem.addData(secondHalf: _*)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val landed = spark.read.parquet(outDir)
    val streamed = landed
      .groupBy("doc_id").agg(min($"owner").as("owner"))
    val batch = SparkEntry.queries("q_dedup_owner")(spark, Sf)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
    // and the restart boundary was genuinely crossed: a post-restart doc
    // (second half arrives only after the restart) whose owner is a
    // pre-restart doc was decided from RECOVERED bucket state
    assert(landed.filter($"doc_id" >= split && $"owner" < split).count() > 0,
      "no cross-restart owner decision — the fixture split proves nothing")
  }

  test("streaming corpus ingest == batch filter+dedup on the same docs") {
    implicit val sqlCtx = spark.sqlContext
    val keep1 = "the cat and the dog is in a tree"
    val keep2 = "a fish of the sea is in the net"
    val mem = MemoryStream[(Long, String, Timestamp)]
    val stream = Streaming.corpusIngestStream(
      mem.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("ingest_out")
      .outputMode("append").start()
    try {
      // batch 1: two keepers (one duplicated), one too-short junk doc
      mem.addData((1L, keep1, ts(0)), (2L, keep1, ts(1)), (3L, "x y", ts(1)))
      stream.processAllAvailable()
      // batch 2: an in-horizon duplicate of keep1 and a fresh keeper
      mem.addData((4L, keep1, ts(2)), (5L, keep2, ts(3)))
      stream.processAllAvailable()
    } finally stream.stop()
    val out = spark.table("ingest_out").select("text").collect()
      .map(_.getString(0))
    // exactly one survivor per distinct kept text, junk filtered out
    assert(out.sorted.toSeq === Seq(keep1, keep2).sorted,
      s"ingest emitted: ${out.mkString(" | ")}")
  }

  test("streaming tail: ingest lands through the packed-shard writer, replays idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val keepA = "the cat and the dog is in a tree"
    val keepB = "a fish of the sea is in the net"
    val keepC = "the bird and a bee fly to the hive"
    val base = java.nio.file.Files
      .createTempDirectory("graft_stream_shards")
    val out = s"$base/shards"
    val ckpt = s"$base/ckpt"
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = Streaming.corpusIngestToShards(
      mem.toDF().toDF("doc_id", "text", "ts"), out, ckpt)
    try {
      // batch of keepers + junk + an exact duplicate
      mem.addData((1L, keepA, ts(0)), (2L, "x y", ts(0)), (3L, keepB, ts(1)))
      q.processAllAvailable()
      mem.addData((4L, keepA, ts(2)), (5L, keepC, ts(3)))
      q.processAllAvailable()
    } finally q.stop()

    val landed = spark.read.parquet(out)
    // junk filtered, duplicate dropped across batches: A, B, C survive
    assert(landed.select("doc_id").collect().map(_.getLong(0)).sorted
      === Array(1L, 3L, 5L),
      s"landed: ${landed.collect().mkString("; ")}")
    // shard invariants survive the streaming path: hive-partitioned by
    // (batch_id, shard), ONE file per shard partition, rows in-file
    // sorted by (seq_id, doc_id)
    // partition-dir values re-infer as int on read; normalize to long
    val files = landed.select(input_file_name().as("f"),
        col("batch_id").cast("long"), col("shard").cast("long"),
        col("seq_id"), col("doc_id")).collect()
    files.groupBy(r => (r.getLong(1), r.getLong(2))).foreach {
      case (part, rows) =>
        assert(rows.map(_.getString(0)).distinct.length === 1,
          s"shard partition $part split across files")
        val order = rows.map(r => (r.getLong(3), r.getLong(4)))
        assert(order.toSeq == order.sortBy(identity).toSeq,
          s"in-file order broken for $part: ${order.toSeq}")
    }
    // replay contract: re-landing batch 0's surviving docs under the same
    // batch_id (foreachBatch is at-least-once) must not duplicate rows —
    // dynamic partition overwrite rewrites, never appends
    val before = spark.read.parquet(out).count()
    Streaming.shardBatchWriter(out)(
      Seq((1L, keepA), (3L, keepB)).toDF("doc_id", "text"), 0L)
    val after = spark.read.parquet(out).count()
    assert(after === before, s"replay duplicated rows: $before -> $after")
  }

  test("streamed IVF index deltas == the batch assignment, replay-safe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_ivf_inc")
    val root = s"$base/table"
    val ckpt = s"$base/ckpt"
    // frozen 2-centroid codebook; vectors split across 3 micro-batches
    val cents = Seq((0L, Seq(0f, 0f), 0.0), (1L, Seq(10f, 10f), 200.0))
      .toDF("cid", "cemb", "cnrm2")
    // (i, i): nearer (0,0) iff i < 5; i = 5 is an exact distance tie,
    // resolved to the LOWER cid by the min_by (dist2, cid) struct order
    val vecs = (1L to 8L).map(i => (i, Seq(i.toFloat, i.toFloat)))
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = graft.stream.Streaming.ivfIngest(
      mem.toDF().toDF("vec_id", "embedding"), cents, root, ckpt)
    try {
      mem.addData(vecs(0), vecs(1), vecs(2))
      q.processAllAvailable()
      mem.addData(vecs(3))
      q.processAllAvailable()
      mem.addData(vecs(4), vecs(5), vecs(6), vecs(7))
      q.processAllAvailable()
    } finally q.stop()
    assert(graft.io.TableFormat.latestVersion(root) === 2)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
      df.select("vec_id", "cell", "nrm").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    val streamed = rows(graft.io.TableFormat.readSnapshot(spark, root))
    val batch = rows(graft.ops.Similarity.assignVectors(
      vecs.toDF("vec_id", "embedding"), cents))
    assert(streamed === batch,
      "incrementally maintained IVF index drifted from the batch build")
    // every vector landed in its true nearest cell; the i = 5 tie went
    // to the lower cid
    assert(streamed.map(v => v._1 -> v._2).toMap ===
      (1L to 8L).map(i => i -> (if (i <= 5) 0L else 1L)).toMap)
    // replay of a committed batch loses the manifest CAS — no duplicates
    assert(!graft.io.TableFormat.appendBatch(
      graft.ops.Similarity.assignVectors(
        Seq((99L, Seq(1f, 1f))).toDF("vec_id", "embedding"), cents),
      root, 1L))
    assert(rows(graft.io.TableFormat.readSnapshot(spark, root)) === batch)
  }

  test("streamed postings deltas == the batch-built index, replay-safe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_postings_inc")
    val root = s"$base/table"
    val ckpt = s"$base/ckpt"
    val allDocs = Seq(
      (1L, "the cat sat"), (2L, "the dog sat down"),
      (3L, "a cat and a dog"), (4L, "down the hill"), (5L, "the end"))
    val mem = MemoryStream[(Long, String)]
    val q = graft.stream.Streaming.postingsIngest(
      mem.toDF().toDF("doc_id", "text"), root, ckpt)
    try {
      mem.addData(allDocs(0), allDocs(1))
      q.processAllAvailable()
      mem.addData(allDocs(2))
      q.processAllAvailable()
      mem.addData(allDocs(3), allDocs(4))
      q.processAllAvailable()
    } finally q.stop()
    // one snapshot commit per micro-batch
    assert(graft.io.TableFormat.latestVersion(root) === 2)
    def agg(p: org.apache.spark.sql.DataFrame) =
      graft.ops.TextOps.postingsFromPairs(p).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSeq
    val streamed = agg(graft.io.TableFormat.readSnapshot(spark, root)
      .select(col("doc_id"), col("tok").as("token")))
    val batch = agg(allDocs.toDF("doc_id", "text")
      .select(col("doc_id"), explode(
        graft.ops.TextOps.tokens(col("text"))).as("token")))
    assert(streamed === batch,
      "incrementally maintained postings drifted from the batch build")
    // at-least-once replay of an already-committed batch is a no-op:
    // the manifest CAS refuses the duplicate version
    assert(!graft.io.TableFormat.appendBatch(
      Seq((9L, 0, "ghost")).toDF("doc_id", "pos", "tok"), root, 1L))
    assert(agg(graft.io.TableFormat.readSnapshot(spark, root)
      .select(col("doc_id"), col("tok").as("token"))) === batch)
  }

  test("mapGroupsWithState accumulates running per-user counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(fixture: _*)
    val q = Streaming.runningCounts(spark, mem.toDF())
      .writeStream.format("memory").queryName("counts_out")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()

    val last = spark.table("counts_out")
      .groupBy("user_id").agg(max("n").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(last(1L) === 4L)
    assert(last(2L) === 2L)
  }

  test("transformWithState emits exactly what mapGroupsWithState emits") {
    implicit val sqlCtx = spark.sqlContext
    // the new API requires the RocksDB state store provider; scope it to
    // this query and restore so the other streaming tests keep the default
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Ev]
      mem.addData(fixture: _*)
      val q = Streaming.runningCountsTws(spark, mem.toDF())
        .writeStream.format("memory").queryName("counts_tws_out")
        .outputMode("update").start()
      try q.processAllAvailable() finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    // the old API over the identical fixture (default state store)
    val mem2 = MemoryStream[Ev]
    mem2.addData(fixture: _*)
    val q2 = Streaming.runningCounts(spark, mem2.toDF())
      .writeStream.format("memory").queryName("counts_mgs_tw_out")
      .outputMode("update").start()
    try q2.processAllAvailable() finally q2.stop()

    // identical per-user terminal state ('update' output emits one row per
    // key per batch, so compare the max-n row per user on both sides)
    def terminal(table: String) = spark.table(table)
      .groupBy("user_id").agg(max("n").as("n"), max("last_sec").as("last"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val tws = terminal("counts_tws_out")
    assert(tws === terminal("counts_mgs_tw_out"))
    assert(tws.map(_._1) === Set(1L, 2L)) // and it's not vacuously empty
  }

  test("native session_window == gaps-and-islands formulation") {
    val ev = graft.io.Sources.table(spark, Sf, "events")
    val native = Streaming.sessionizeNative(ev)
      .select("user_id", "start_sec", "n_events")
    val portable = Streaming.sessionize(ev)
      .select("user_id", "start_sec", "n_events")
    assert(native.exceptAll(portable).count() === 0)
    assert(portable.exceptAll(native).count() === 0)
  }

  test("session gap boundaries match native (exact-gap merges, +1µs splits)") {
    // Native session_window on 4.1.2 MERGES an event at exactly
    // last_ts + gap and splits 1 µs past it; sub-second gaps in
    // (1800, 1801) split too (the old second-truncated `> 1800`
    // formulation kept them together — ADVICE r1 low)
    val base = Timestamp.valueOf("2024-01-01 00:00:00")
    def at(micros: Long): Timestamp = {
      val t = new Timestamp(base.getTime + micros / 1000)
      t.setNanos(((micros % 1000000) * 1000).toInt)
      t
    }
    val ev = Seq(
      Ev(0, at(0L), 1, "a", 0.0, "{}"),
      Ev(1, at(1800L * 1000000), 1, "a", 0.0, "{}"), // exact gap: merge
      Ev(2, at(0L), 2, "a", 0.0, "{}"),
      Ev(3, at(1800L * 1000000 + 1), 2, "a", 0.0, "{}"), // 1 µs past: split
      Ev(4, at(0L), 3, "a", 0.0, "{}"),
      Ev(5, at(1800L * 1000000 + 500000), 3, "a", 0.0, "{}")) // 1800.5s: split
      .toDF()
    val portable = Streaming.sessionize(ev)
    assert(portable.filter($"user_id" === 1).count() === 1)
    assert(portable.filter($"user_id" === 2).count() === 2)
    assert(portable.filter($"user_id" === 3).count() === 2)
    val native = Streaming.sessionizeNative(ev)
      .select("user_id", "start_sec", "n_events")
    val p2 = portable.select("user_id", "start_sec", "n_events")
    assert(native.exceptAll(p2).count() === 0)
    assert(p2.exceptAll(native).count() === 0)
  }

  test("sliding windows double-count each event across buckets") {
    val slide = graft.SparkEntry.queries("q_stream_slide")(spark, Sf)
    val total = slide.agg(sum("n_events")).collect().head.getLong(0)
    val nEvents = graft.io.Sources.table(spark, Sf, "events").count()
    assert(total === 2 * nEvents)
  }

  test("flatMapGroupsWithState sessions == batch sessionize (closed sessions)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // sentinels 10h past the fixture close every real session; their own
    // session stays open in state and must NOT be emitted
    val sentinels = Seq(Ev(98, ts(59, 59), 1, "x", 0, "{}"),
      Ev(99, ts(59, 59), 2, "x", 0, "{}"))
      .map(e => e.copy(ts = new Timestamp(e.ts.getTime + 10 * 3600 * 1000)))
    mem.addData(fixture ++ sentinels: _*)
    val q = Streaming.sessionStream(spark, mem.toDF())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sess_out")
      .select("user_id", "start_sec", "n_events")
    val batch = Streaming.sessionize(fixture.toDF())
      .select("user_id", "start_sec", "n_events")
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("stream-stream interval join matches the batch pairing") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val withErrors = fixture ++ Seq(
      Ev(10, ts(3), 1, "error", 0, "{}"), // catches purchases at 4 and 12
      Ev(11, ts(20), 2, "error", 0, "{}"), // catches purchase at 25
      Ev(12, ts(58), 2, "error", 0, "{}")) // no purchase follows
    mem.addData(withErrors: _*)
    val q = Streaming.errorPurchaseJoin(mem.toDF())
      .writeStream.format("memory").queryName("join_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("join_out")
      .select("err_id", "p_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    val expected = for {
      e <- withErrors if e.event_type == "error"
      p <- withErrors
      if p.event_type == "purchase" && p.user_id == e.user_id
      if p.ts.getTime >= e.ts.getTime &&
        p.ts.getTime < e.ts.getTime + 30 * 60 * 1000
    } yield (e.event_id, p.ts)
    assert(got === expected.toSet)
    assert(got.size === 3)
    // mode-agnostic twin: the SAME function in batch lands the same pairs
    val batchPairs = Streaming
      .errorPurchaseJoin(withErrors.toDF())
      .select("err_id", "p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamPairs = spark.table("join_out")
      .select("err_id", "p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamPairs === batchPairs)
  }

  test("foreachBatch upsert sink dedups within the batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(fixture :+ Ev(0, ts(1), 9, "dup", 0.0, "{}"): _*)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = Streaming.foreachBatchUpsert(mem.toDF()) { (batch, id) =>
      seen += ((id, batch.count()))
    }.start()
    try q.processAllAvailable() finally q.stop()
    // 7 rows in, one duplicate event_id -> 6 reach the writer
    assert(seen.map(_._2).sum === 6L)
  }
}
