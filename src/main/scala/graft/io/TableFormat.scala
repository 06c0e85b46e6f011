package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A minimal snapshot table format: parquet data files + a versioned
  * manifest log — the public Delta-lake/Iceberg commit pattern
  * (log-of-manifests, not directory listing) reduced to the two
  * capabilities the query tier needs: atomic APPEND and TIME TRAVEL.
  *
  * Layout under a table root:
  * {{{
  *   data/<uuid>/part-*.parquet     — immutable data directories
  *   manifest/v<N>.json             — snapshot N = the data dirs listed
  * }}}
  *
  * Commit protocol: write the new data dir, then install `v<N>.json` via
  * temp-file + atomic HARD LINK (not rename: POSIX rename replaces an
  * existing target, which would let a racing committer silently clobber
  * a committed version — link() fails with EEXIST instead). The link is
  * the commit point — a reader either sees v<N> complete or not at all;
  * a crashed writer leaves an orphan data dir that no manifest
  * references (invisible, GC fodder), never a torn snapshot. Readers
  * NEVER list `data/`: snapshot N is exactly the files `v<N>.json`
  * names, which is what makes time travel O(1) metadata and makes
  * concurrent writers serializable by manifest-version CAS (the link
  * fails if v<N> exists): [[append]] retries at N+1 itself (bounded —
  * its entry is version-independent), [[appendBatch]] treats a loss as
  * "this batch already committed", and [[compact]] RAISES on a loss —
  * its rewritten dir snapshots a version that is no longer latest, so
  * only the caller can decide to re-run against the new head.
  *
  * Scale: a 100 TB table is ~10⁵-10⁶ data files; the manifest stays a
  * file LIST (KB-MB of metadata per commit, written once, never
  * rewritten per-file like hive-style rename commits), and each entry
  * carries optional min/max ZONE-MAP stats of a key column so range
  * reads prune dirs before any parquet footer is opened
  * ([[readSnapshot]]'s `range`). Snapshot reads pass the explicit file
  * list to the parquet reader, so partition pruning and pushdown work
  * unchanged. What this slice deliberately omits from the full formats:
  * compaction and deletes — SURVEY §4 documents those as design-scoped.
  */
object TableFormat {

  private def manifestDir(root: String): Path = Paths.get(root, "manifest")

  /** Latest committed version, or -1 for an empty/absent table. */
  def latestVersion(root: String): Int =
    listVersions(root).foldLeft(-1)(math.max)

  /** One manifest entry: a data dir plus optional min/max stats of the
    * table's stats column — the per-file zone map that makes range
    * predicates prune I/O at the METADATA level (the Delta/Iceberg
    * `stats`/`lower_bounds` idea, one long column's worth). `statsOf`
    * names the column the bounds describe (r14): a consumer pruning by
    * key — [[merge]]/[[deleteKeys]] — must check it matches ITS key, or
    * bounds recorded for some other column would silently misclassify
    * dirs as untouched (carry a stale row AND union its replacement).
    */
  private[graft] case class Entry(dir: String, lo: Option[Long],
                                  hi: Option[Long],
                                  statsOf: Option[String] = None)

  private def readManifest(root: String, v: Int): Seq[Entry] = {
    val f = manifestDir(root).resolve(s"v$v.json")
    require(Files.exists(f), s"no snapshot v$v at $root")
    // JSON-lines, one entry per line: dir<TAB>lo<TAB>hi<TAB>statsCol
    // (lo/hi/col empty when the append carried no stats; the 3-field
    // pre-r14 form still parses as stats of an unknown column, which
    // every consumer treats conservatively). Deliberately not
    // JSON-parsed — no JSON library in the dependency set, and the
    // writer below is the only producer.
    new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      .split("\n").toSeq.filter(_.nonEmpty)
      .map { line =>
        line.split("\t", -1) match {
          case Array(d, "", "") => Entry(d, None, None)
          case Array(d, lo, hi) => Entry(d, Some(lo.toLong), Some(hi.toLong))
          case Array(d, "", "", _) => Entry(d, None, None)
          case Array(d, lo, hi, sc) =>
            Entry(d, Some(lo.toLong), Some(hi.toLong),
              Some(sc).filter(_.nonEmpty))
          case other => throw new IllegalStateException(
            s"torn manifest line in v$v: '$line'")
        }
      }
  }

  private[graft] def writeManifest(root: String, v: Int,
                                   entries: Seq[Entry]): Unit = {
    Files.createDirectories(manifestDir(root))
    val body = entries.map(e =>
        s"${e.dir}\t${e.lo.fold("")(_.toString)}\t" +
          s"${e.hi.fold("")(_.toString)}\t${e.statsOf.getOrElse("")}")
      .mkString("", "\n", "\n")
    val tmp = Files.createTempFile(manifestDir(root), s"v$v", ".tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    // HARD-LINK creation is the commit, not a rename: POSIX rename
    // REPLACES an existing target (ATOMIC_MOVE onto an occupied version
    // silently clobbers it — measured on this platform), while link()
    // fails with EEXIST atomically. The link shares the fully-written
    // tmp file's inode, so a reader sees v<N> whole or not at all, and a
    // concurrent committer of the same version loses with
    // FileAlreadyExistsException — the CAS the protocol needs.
    try Files.createLink(manifestDir(root).resolve(s"v$v.json"), tmp)
    finally Files.deleteIfExists(tmp)
  }

  /** min/max of `c` over a landed data dir — the zone-map stats shared
    * by every committing entry point (read back from the written files,
    * so the stats describe exactly what landed).
    */
  private def dirStats(spark: SparkSession, dataDir: String,
                       c: String): Option[(Long, Long)] = {
    val r = spark.read.parquet(dataDir)
      .agg(min(col(c)).cast("long"), max(col(c)).cast("long"))
      .collect()(0)
    if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1)))
  }

  /** All committed version numbers at `root` (unordered). */
  private def listVersions(root: String): Seq[Int] = {
    val dir = manifestDir(root)
    if (!Files.isDirectory(dir)) return Seq.empty
    val stream = Files.list(dir)
    try stream.iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toInt }
      .toList
    finally stream.close() // Files.list holds a directory handle open
  }

  /** Normalized-absolute data-dir path: the SAME spelling at append time
    * and at [[vacuum]] listing time, whatever the caller's root spelling
    * (trailing slash, relative, "." segments) — a mismatch here would
    * make vacuum classify live dirs as garbage.
    */
  private def newDataDir(root: String): String =
    Paths.get(root, "data", java.util.UUID.randomUUID().toString)
      .toAbsolutePath.normalize.toString

  /** Append `df` as a new snapshot: new immutable data dir + manifest
    * v(latest+1) = previous entries ++ the new one. `statsCol` (a long
    * column) records the dir's min/max in the manifest — one tiny
    * aggregate at write time buys metadata-level pruning on every
    * future range read. Returns the committed version.
    */
  def append(df: DataFrame, root: String,
             statsCol: Option[String] = None): Int = {
    val dataDir = newDataDir(root)
    df.write.parquet(dataDir)
    val stats = statsCol.flatMap(dirStats(df.sparkSession, dataDir, _))
    val entry = Entry(dataDir, stats.map(_._1), stats.map(_._2),
      statsCol.filter(_ => stats.nonEmpty))
    // Bounded CAS retry: an append's entry is version-independent (new
    // data dir + whatever the latest manifest lists), so a loser can
    // always re-read latest and re-attempt at latest+1 — the data dir is
    // written exactly once, only the manifest install repeats. Bounded so
    // a manifest-dir pathology (e.g. permissions flapping) surfaces as an
    // error, not a livelock.
    var attempt = 0
    while (true) {
      val prev = latestVersion(root)
      val entries =
        (if (prev < 0) Seq.empty else readManifest(root, prev)) :+ entry
      val v = prev + 1
      try { writeManifest(root, v, entries); return v }
      catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          attempt += 1
          if (attempt >= MaxCommitRetries) throw new IllegalStateException(
            s"append at $root lost the manifest CAS $MaxCommitRetries " +
              "times in a row — giving up rather than livelock", e)
      }
    }
    -1 // unreachable: the loop exits only by return or throw
  }

  /** CAS-retry bound for [[append]] — generous against real contention
    * (each loss means another writer COMMITTED, so the table is making
    * progress), small enough to fail fast on a stuck manifest dir.
    */
  private val MaxCommitRetries = 64

  /** Read snapshot `version` (default: latest). Time travel = pick an
    * older manifest; the data dirs are immutable so the old snapshot is
    * byte-identical to when it was committed.
    *
    * `range = (lo, hi)` prunes data dirs whose recorded [min, max] does
    * not intersect the inclusive predicate range BEFORE any parquet
    * footer is opened — manifest-level skipping; dirs without stats are
    * conservatively kept. The caller still applies its own row filter:
    * skipping is an I/O optimization, never a row-level guarantee.
    */
  /** Evolved read of a set of data dirs: mergeSchema resolves the union
    * schema across dirs appended before/after a widening evolution, so
    * every consumer (snapshot reads, merge/delete rewrites, the change
    * feed) sees ONE deterministic schema — a bare parquet read would
    * take whichever file lists first, making rewrite schemas
    * listing-order-dependent on an evolved table.
    */
  private def readDirs(spark: SparkSession, dirs: Seq[Entry]): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dirs.map(_.dir): _*)

  def readSnapshot(spark: SparkSession, root: String,
                   version: Int = -1,
                   range: Option[(Long, Long)] = None): DataFrame = {
    val v = if (version < 0) latestVersion(root) else version
    val entries = readManifest(root, v)
    val kept = range match {
      case None => entries
      case Some((lo, hi)) => entries.filter(e =>
        (e.lo, e.hi) match {
          case (Some(l), Some(h)) => h >= lo && l <= hi
          case _ => true
        })
    }
    require(kept.nonEmpty,
      s"snapshot v$v has no data dirs in range $range — empty-frame " +
        "schemas are unknowable from a manifest; handle upstream")
    // mergeSchema = SCHEMA EVOLUTION on append: a later dir may carry
    // columns earlier dirs lack (widening adds, never drops/renames);
    // the union schema resolves them and old rows read as null — while
    // TIME TRAVEL to a pre-evolution version still shows the narrow
    // schema, because only the dirs the old manifest lists are read.
    // Cost at 100 TB: one footer per DIR at planning (the manifest keeps
    // dirs coarse), not per file of the table.
    readDirs(spark, kept)
  }

  /** Bin-pack the LATEST snapshot into one fresh data dir and commit it
    * as the next version. Compaction is just another commit: readers of
    * older versions keep their original dirs (time travel intact,
    * nothing is deleted — physical GC of unreferenced dirs is a separate
    * janitor concern), and the new manifest has ONE entry whose stats
    * are recomputed from the rewritten files. At 100 TB this runs
    * per-partition-range rather than whole-table, but the commit
    * protocol — rewrite, then one manifest move — is identical.
    *
    * A lost commit CAS RAISES [[java.nio.file.FileAlreadyExistsException]]
    * here (no auto-retry, unlike [[append]]): the rewritten dir is a
    * snapshot of a version that is no longer latest, so blindly
    * committing it at N+1 would silently DROP the concurrent append's
    * rows. The caller re-runs compact against the new head; the stale
    * dir is unreferenced and [[vacuum]] reclaims it.
    */
  def compact(spark: SparkSession, root: String,
              statsCol: Option[String] = None): Int = {
    val prev = latestVersion(root)
    require(prev >= 0, s"nothing to compact at $root")
    val dataDir = newDataDir(root)
    readSnapshot(spark, root, prev).write.parquet(dataDir)
    val stats = statsCol.flatMap(dirStats(spark, dataDir, _))
    val v = prev + 1
    writeManifest(root, v,
      Seq(Entry(dataDir, stats.map(_._1), stats.map(_._2),
      statsCol.filter(_ => stats.nonEmpty))))
    v
  }

  /** File-pruned COPY-ON-WRITE upsert (the Delta/Iceberg MERGE pattern
    * reduced): rows of `updates` REPLACE same-key rows of the latest
    * snapshot; keys present nowhere are inserted. Only data dirs whose
    * zone-map key range contains at least one update key are rewritten —
    * at 100 TB that is the whole point: a trickle of updates rewrites a
    * handful of dirs, not the table. Untouched dirs carry into the new
    * manifest VERBATIM (same path, same stats), which the spec pins.
    *
    * Touched-dir detection never collects data: update keys join the
    * broadcast manifest bounds and only ≤ |manifest| matched indices
    * come back to the driver. Dirs without recorded stats are
    * conservatively rewritten (soundness over pruning), so the manifest
    * contract is: commit with `statsCol = keyCol` to earn pruning.
    * Caller contract: `updates` has unique keys. A lost commit CAS
    * RAISES like [[compact]] — the rewrite snapshots a head that is no
    * longer latest, so only the caller can re-run against the new one.
    */
  def merge(spark: SparkSession, root: String, updates: DataFrame,
            keyCol: String, statsCol: Option[String] = None): Int = {
    val prev = latestVersion(root)
    require(prev >= 0, s"nothing to merge into at $root")
    // an empty delta must not land an empty dir + a new version every
    // idle cycle (nor wholesale-rewrite stats-less dirs); mirror
    // deleteKeys' no-op
    if (updates.isEmpty) return prev
    val entries = readManifest(root, prev)
    val (touched, untouched) = touchedSplit(spark, entries, updates, keyCol)
    val dataDir = newDataDir(root)
    val merged =
      if (touched.isEmpty) updates
      else readDirs(spark, touched)
        .join(updates.select(col(keyCol)), Seq(keyCol), "left_anti")
        // allowMissingColumns: on an evolved table the carried rows and
        // the updates may straddle a widening — absent side reads null
        .unionByName(updates, allowMissingColumns = true)
    merged.write.parquet(dataDir)
    val stats = statsCol.flatMap(dirStats(spark, dataDir, _))
    val v = prev + 1
    writeManifest(root, v,
      untouched :+ Entry(dataDir, stats.map(_._1), stats.map(_._2),
      statsCol.filter(_ => stats.nonEmpty)))
    v
  }

  /** Split `entries` into (touched, untouched) by whether any key of
    * `keyed`'s `keyCol` falls inside the entry's zone-map range. One
    * scan of the key frame against the broadcast manifest bounds; only
    * ≤ |manifest| matched indices reach the driver.
    *
    * Pruning is SOUND-FIRST: an entry earns "untouched" only when its
    * recorded bounds provably exclude every key, which requires (a) the
    * entry's `statsOf` to name THIS key column — bounds of some other
    * column say nothing about key containment — and (b) an integral key
    * type, because the bounds are longs and a lossy cast (string key →
    * null) would exclude rows it never tested. Anything else is
    * conservatively touched: correctness costs a rewrite, never a
    * carried stale row.
    */
  private def touchedSplit(spark: SparkSession, entries: Seq[Entry],
      keyed: DataFrame, keyCol: String): (Seq[Entry], Seq[Entry]) = {
    val keyIsIntegral = {
      import org.apache.spark.sql.types._
      keyed.schema(keyCol).dataType match {
        case LongType | IntegerType | ShortType | ByteType => true
        case _ => false
      }
    }
    val statted =
      if (!keyIsIntegral) Seq.empty
      else entries.zipWithIndex.collect {
        case (Entry(_, Some(l), Some(h), Some(sc)), i) if sc == keyCol =>
          (i, l, h)
      }
    val touchedIdx: Set[Int] =
      entries.indices.filterNot(i => statted.exists(_._1 == i)).toSet ++ {
        if (statted.isEmpty) Set.empty[Int]
        else {
          import spark.implicits._
          val bounds = statted.toDF("i", "lo", "hi")
          keyed.select(col(keyCol).cast("long").as("k"))
            .join(broadcast(bounds),
              col("k") >= col("lo") && col("k") <= col("hi"))
            .select("i").distinct().collect().map(_.getInt(0)).toSet
        }
      }
    val (t, u) = entries.zipWithIndex.partition { case (_, i) => touchedIdx(i) }
    (t.map(_._1), u.map(_._1))
  }

  /** Row-level DELETE by key — the same prune-rewrite-commit core as
    * [[merge]] with an empty insert set: touched dirs are rewritten
    * minus the deleted keys, untouched dirs carry verbatim. `keys` is a
    * one-column frame of `keyCol` values (unique not required).
    */
  def deleteKeys(spark: SparkSession, root: String, keys: DataFrame,
                 keyCol: String, statsCol: Option[String] = None): Int = {
    val prev = latestVersion(root)
    require(prev >= 0, s"nothing to delete from at $root")
    val entries = readManifest(root, prev)
    val (touched, untouched) = touchedSplit(spark, entries, keys, keyCol)
    if (touched.isEmpty) return prev // nothing referenced: no-op, no commit
    val dataDir = newDataDir(root)
    readDirs(spark, touched)
      .join(keys.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
      .write.parquet(dataDir)
    val stats = statsCol.flatMap(dirStats(spark, dataDir, _))
    val v = prev + 1
    writeManifest(root, v,
      untouched :+ Entry(dataDir, stats.map(_._1), stats.map(_._2),
      statsCol.filter(_ => stats.nonEmpty)))
    v
  }

  /** Row-level CHANGE FEED between two snapshots `fromVersion` →
    * `toVersion` — what an incremental downstream consumer replays
    * instead of re-reading the table (the Delta CDF idea, derived rather
    * than stored). Because every commit is copy-on-write at dir
    * granularity, the manifest diff bounds the work: rows in dirs ADDED
    * since `fromVersion` are candidate inserts/updates, rows in dirs
    * DROPPED are candidate deletes, and dirs carried verbatim cannot
    * contain changes — CDC cost ∝ changed files, never table size. The
    * key joins then classify: `insert` (key only in added), `delete`
    * (key only in dropped), and for a key in both with differing
    * content (null-safe full-row compare, so a compaction that rewrites
    * every dir byte-identically yields an EMPTY feed) BOTH sides are
    * emitted — `update_preimage` (old row) and `update_postimage` (new
    * row), the Delta-CDF shape that lets a downstream aggregate retract
    * the old contribution and apply the new one without re-reading the
    * table ([[qTableMv]] is exactly that consumer). Returns full table
    * rows plus a `change_type` column.
    */
  def readChanges(spark: SparkSession, root: String, fromVersion: Int,
                  toVersion: Int, keyCol: String): DataFrame = {
    require(fromVersion < toVersion,
      s"change feed needs fromVersion < toVersion, got $fromVersion/$toVersion")
    val from = readManifest(root, fromVersion)
    val to = readManifest(root, toVersion)
    val fromDirs = from.map(_.dir).toSet
    val toDirs = to.map(_.dir).toSet
    val added = to.filterNot(e => fromDirs(e.dir))
    val dropped = from.filterNot(e => toDirs(e.dir))
    val ct = lit("insert")
    def rows(dirs: Seq[Entry]): DataFrame = readDirs(spark, dirs)
    (added.nonEmpty, dropped.nonEmpty) match {
      case (false, false) => // nothing moved: provably empty feed — with
        // the table's REAL schema (schema-only read of the head dirs;
        // fabricated columns would break unions across windows)
        rows(to).withColumn("change_type", ct).filter(lit(false))
      case (true, false) => // append-only delta: every row is an insert
        rows(added).withColumn("change_type", ct)
      case (false, true) => // pure retraction
        rows(dropped).withColumn("change_type", lit("delete"))
      case (true, true) =>
        val allCols = rows(added).columns.toSeq
        val cols = allCols.filterNot(_ == keyCol)
        def keyed(df: DataFrame): DataFrame =
          df.select(col(keyCol), struct(cols.map(col): _*).as("v"))
        val n = keyed(rows(added))
        val o = keyed(rows(dropped))
        // restore the table's NATURAL column order (+ change_type last)
        // — every other branch preserves it, and a positional union of
        // per-window feeds must never misalign columns
        def restore(df: DataFrame): DataFrame =
          df.select(allCols.map(c =>
            if (c == keyCol) col(c) else col(s"v.$c").as(c)) :+
            col("change_type"): _*)
        // both update images come from ONE pass over the joined frame
        // (an explode of the two structs), so the join + null-safe
        // content compare run once, not once per image branch
        val updates = n.withColumnRenamed("v", "nv")
          .join(o.withColumnRenamed("v", "ov"), Seq(keyCol))
          .filter(!(col("nv") <=> col("ov")))
          .select(col(keyCol), explode(array(
            struct(lit("update_preimage").as("t"), col("ov").as("v")),
            struct(lit("update_postimage").as("t"), col("nv").as("v"))))
            .as("p"))
          .select(col(keyCol), col("p.v").as("v"),
            col("p.t").as("change_type"))
        restore(n.join(o.select(col(keyCol)), Seq(keyCol), "left_anti")
            .withColumn("change_type", ct))
          .unionByName(restore(
            o.join(n.select(col(keyCol)), Seq(keyCol), "left_anti")
              .withColumn("change_type", lit("delete"))))
          .unionByName(restore(updates))
    }
  }

  /** Range-aware compaction — the OPTIMIZE half [[compact]] lacks: the
    * head snapshot is RANGE-REPARTITIONED on `statsCol` into `nBuckets`
    * data dirs, each committed with its own tight zone map, so
    * manifest-level skipping works AFTER compaction too ([[compact]]'s
    * single dir has one all-covering range — every range read touches
    * it). This is how accumulated streaming deltas (each spanning the
    * whole key range) are periodically re-sorted into a skippable
    * layout; at 100 TB it runs per partition-range, same commit
    * protocol. Same CAS-loss semantics as [[compact]]: a lost commit
    * RAISES, because the rewrite snapshots a stale head.
    */
  def compactRanged(spark: SparkSession, root: String, statsCol: String,
                    nBuckets: Int): Int = {
    require(nBuckets >= 1, s"need at least one bucket, got $nBuckets")
    val prev = latestVersion(root)
    require(prev >= 0, s"nothing to compact at $root")
    val head = readSnapshot(spark, root, prev)
    // range-repartition orders rows by statsCol across nBuckets
    // partitions (sampled range bounds — disjoint, covering), then land
    // each partition as its own data dir via the partition-id
    val parted = head.repartitionByRange(nBuckets, col(statsCol))
      .withColumn("__bucket", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val buckets = parted.select("__bucket").distinct()
        .collect().map(_.getInt(0)).sorted // ≤ nBuckets driver-side ints
      // a zero-row head has nothing to lay out; committing an EMPTY
      // manifest would make every later readSnapshot throw — no-op like
      // an empty merge instead
      if (buckets.isEmpty) return prev
      val entries = buckets.toSeq.map { b =>
        val dataDir = newDataDir(root)
        parted.filter(col("__bucket") === b).drop("__bucket")
          .write.parquet(dataDir)
        val stats = dirStats(spark, dataDir, statsCol)
        Entry(dataDir, stats.map(_._1), stats.map(_._2),
          Some(statsCol).filter(_ => stats.nonEmpty))
      }
      val v = prev + 1
      writeManifest(root, v, entries)
      v
    } finally { parted.unpersist(); () }
  }

  /** EXACTLY-ONCE streaming sink: manifest version == micro-batch id, so
    * the version CAS is the idempotence mechanism. A replayed batch
    * (restart, retry) sees its version already committed — or loses the
    * link-commit CAS — and skips; a crashed attempt leaves only an orphan
    * data dir. Returns true iff THIS call committed. Use from
    * `foreachBatch((df, id) => TableFormat.appendBatch(df, root, id))`;
    * batch ids from a checkpointed query are contiguous from 0, which is
    * exactly the manifest's version sequence.
    */
  def appendBatch(df: DataFrame, root: String, batchId: Long,
                  statsCol: Option[String] = None): Boolean = {
    val prev = latestVersion(root)
    if (prev >= batchId) return false // replay of an already-committed batch
    require(prev == batchId - 1,
      s"batch $batchId arrived over a gap (latest manifest v$prev) — a " +
        "skipped batch would silently vanish from every future snapshot")
    require(batchId <= Int.MaxValue,
      s"batch id $batchId exceeds the manifest version range")
    val dataDir = newDataDir(root)
    df.write.parquet(dataDir)
    val stats = statsCol.flatMap(dirStats(df.sparkSession, dataDir, _))
    val entries =
      (if (prev < 0) Seq.empty else readManifest(root, prev)) :+
        Entry(dataDir, stats.map(_._1), stats.map(_._2),
      statsCol.filter(_ => stats.nonEmpty))
    try { writeManifest(root, batchId.toInt, entries); true }
    catch {
      // lost the CAS to a concurrent attempt of the SAME batch — its
      // commit stands, ours is the orphan
      case _: java.nio.file.FileAlreadyExistsException => false
    }
  }

  /** Drop all manifest versions except the newest `keepLast` — the
    * retention half of the GC story. Time travel to an expired version
    * fails loudly afterwards ([[readSnapshot]]'s missing-manifest
    * require); the data dirs it referenced become [[vacuum]] fodder
    * unless a surviving version still lists them. Returns the expired
    * version numbers.
    */
  def expire(root: String, keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, "must keep at least the head snapshot")
    val head = latestVersion(root)
    val expired = (0 to head - keepLast)
    expired.foreach(v =>
      Files.deleteIfExists(manifestDir(root).resolve(s"v$v.json")))
    expired
  }

  /** Delete every data dir no surviving manifest references — crashed
    * writers' orphans and [[expire]]d snapshots' exclusive dirs. Safe by
    * the commit protocol: a dir becomes VISIBLE only by being listed in
    * a manifest, so "referenced by no manifest" is exactly "invisible to
    * every reader" (modulo a writer mid-commit — production runs this
    * with an age guard; the slice keeps the logic exact and the guard
    * out of scope). Returns the deleted dirs.
    */
  def vacuum(root: String): Seq[String] = {
    val dataRoot = Paths.get(root, "data")
    if (!Files.isDirectory(dataRoot)) return Seq.empty
    // normalize BOTH sides to absolute paths: manifest entries are
    // recorded normalized by [[newDataDir]], but an older manifest (or a
    // caller spelling root differently) must never make a live dir look
    // like garbage
    def norm(p: String): String =
      Paths.get(p).toAbsolutePath.normalize.toString
    val referenced = listVersions(root)
      .flatMap(v => readManifest(root, v).map(e => norm(e.dir))).toSet
    val stream = Files.list(dataRoot)
    val all = try stream.iterator().asScala.map(_.toString).toList
      finally stream.close()
    val garbage = all.filterNot(d => referenced(norm(d)))
    garbage.foreach { d =>
      def rm(p: Path): Unit = {
        if (Files.isDirectory(p)) {
          val s = Files.list(p)
          try s.iterator().asScala.toList.foreach(rm) finally s.close()
        }
        Files.deleteIfExists(p); ()
      }
      rm(Paths.get(d))
    }
    garbage
  }

  // ------------------------------------------------------------ query

  /** Landed two-snapshot table per (session, sfDir) — write-once like
    * [[graft.ops.TextOps]]' shard memo (the snapshots are immutable; the
    * bench pays the land exactly once per pass owner).
    */
  private val tableCache = TrieMap.empty[(SparkSession, String), String]

  private def landedTable(s: SparkSession, dir: String): String =
    tableCache.getOrElseUpdate((s, dir), {
      val root = Files.createTempDirectory("graft_table_snapshot")
        .toString
      val orders = Sources.table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"))
      // v0: two thirds of the table; v1 appends the remaining third —
      // deterministic key-arithmetic slices so the oracle can recompute
      // both snapshots from `orders` alone
      append(orders.filter(col("o_orderkey") % 3 =!= 0), root)
      append(orders.filter(col("o_orderkey") % 3 === 0), root)
      root
    })

  /** Snapshot-N vs snapshot-N−1 status counts through the manifest log:
    * proves append atomicity + time travel end-to-end (v0 read AFTER v1
    * exists must still see only v0's rows). The oracle recomputes both
    * snapshots from the same key arithmetic on `orders`.
    */
  private def qTableSnapshot(s: SparkSession, dir: String): DataFrame = {
    val root = landedTable(s, dir)
    val v1 = readSnapshot(s, root)
    val v0 = readSnapshot(s, root, version = latestVersion(root) - 1)
    v1.groupBy("o_orderstatus").agg(count(lit(1)).as("n_v1"))
      .join(
        v0.groupBy("o_orderstatus").agg(count(lit(1)).as("n_v0")),
        Seq("o_orderstatus"), "left")
      .select(col("o_orderstatus"), coalesce(col("n_v0"), lit(0L)).as("n_v0"),
        col("n_v1"))
      .orderBy("o_orderstatus")
  }

  /** Landed RANGE-split snapshot table: orders appended as two key
    * ranges (≤ mid, > mid) with o_orderkey stats in the manifest —
    * the layout where manifest-level skipping has something to skip.
    */
  private val rangeCache = TrieMap.empty[(SparkSession, String), (String, Long)]

  /** (orders frame, lo, hi, mid) shared by the range/merge fixtures —
    * integer midpoint, exact in both engines, so every oracle recomputes
    * the same split from `orders` alone. One derivation site: the
    * fixtures and their oracles must not drift on the split rule.
    */
  private def orderKeySplit(s: SparkSession,
      dir: String): (DataFrame, Long, Long, Long) = {
    val orders = Sources.table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
    val r = orders.agg(min(col("o_orderkey")).cast("long"),
      max(col("o_orderkey")).cast("long")).collect()(0)
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    (orders, lo, hi, (lo + hi) / 2)
  }

  private def landedRangeTable(s: SparkSession,
                               dir: String): (String, Long) =
    rangeCache.getOrElseUpdate((s, dir), {
      val root = Files.createTempDirectory("graft_table_range").toString
      val (orders, _, _, mid) = orderKeySplit(s, dir)
      append(orders.filter(col("o_orderkey") <= mid), root,
        statsCol = Some("o_orderkey"))
      append(orders.filter(col("o_orderkey") > mid), root,
        statsCol = Some("o_orderkey"))
      (root, mid)
    })

  /** Range read through the manifest zone maps: status counts of the
    * lower key half, read with `range` pruning so the upper dir is
    * skipped at the METADATA level (the spec asserts `inputFiles`
    * shrinks — the I/O proof). The row filter stays on top: skipping
    * is an optimization, the predicate is the contract.
    */
  private def qTableSkipping(s: SparkSession, dir: String): DataFrame = {
    val (root, mid) = landedRangeTable(s, dir)
    readSnapshot(s, root, range = Some((Long.MinValue, mid)))
      .filter(col("o_orderkey") <= mid)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  /** Data-dir paths of snapshot `v` — spec window into the manifest
    * (asserting an untouched dir carried VERBATIM through a merge).
    */
  private[graft] def snapshotDirs(root: String, v: Int): Seq[String] =
    readManifest(root, v).map(_.dir)

  /** Landed MERGE fixture: the two-range layout of [[landedRangeTable]]
    * (own root — a merge here must never move the skipping fixture's
    * head), then one copy-on-write upsert: every 7th key of the lower
    * half flips to status 'U' (prunes the rewrite to the LOWER dir) and
    * every 97th key re-lands shifted past the max key as an insert with
    * status 'N' (matches no dir). Key arithmetic only, so the oracle
    * recomputes the merged table from `orders` alone.
    */
  private val mergeCache = TrieMap.empty[(SparkSession, String), String]

  private def landedMergedTable(s: SparkSession, dir: String): String =
    mergeCache.getOrElseUpdate((s, dir), {
      val root = Files.createTempDirectory("graft_table_merge").toString
      val (orders, _, hi, mid) = orderKeySplit(s, dir)
      append(orders.filter(col("o_orderkey") <= mid), root,
        statsCol = Some("o_orderkey"))
      append(orders.filter(col("o_orderkey") > mid), root,
        statsCol = Some("o_orderkey"))
      val updates = orders
        .filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") <= mid)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"))
        // hi + 1: keys start at 0, so a bare +hi shift would land key 0's
        // insert ON the existing max key (replace, not insert — caught by
        // the oracle compare at first land)
        .unionByName(orders.filter(col("o_orderkey") % 97 === 0)
          .select((col("o_orderkey") + hi + 1).as("o_orderkey"),
            lit("N").as("o_orderstatus")))
      merge(s, root, updates, "o_orderkey", statsCol = Some("o_orderkey"))
      root
    })

  /** Status counts of the head snapshot AFTER the copy-on-write upsert —
    * proves matched-replace + not-matched-insert end-to-end through the
    * manifest log (the untouched-dir and time-travel halves are
    * spec-pinned, which a content aggregate cannot see).
    */
  private def qTableMerge(s: SparkSession, dir: String): DataFrame =
    readSnapshot(s, landedMergedTable(s, dir))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  /** The change feed across the fixture's merge commit: exactly the
    * upsert's update pre/post pairs and insert rows, nothing from the
    * carried dir. The oracle restates the fixture's key arithmetic
    * declaratively.
    */
  private def qTableChanges(s: SparkSession, dir: String): DataFrame = {
    val root = landedMergedTable(s, dir)
    val head = latestVersion(root)
    readChanges(s, root, head - 1, head, "o_orderkey")
      .groupBy("change_type").agg(count(lit(1)).as("n"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy("change_type")
  }

  /** Materialized-view maintenance driven by the change feed — the CDF
    * consumer the pre/post images exist for: the head's status counts
    * are derived as (pre-merge counts) + (feed delta: +1 for
    * insert/update_postimage, −1 for delete/update_preimage), never
    * re-reading the merged table. The oracle recomputes the same counts
    * directly from the merged head ([[qTableMerge]]'s SQL), so a hash
    * match proves incremental == recompute.
    */
  private def qTableMv(s: SparkSession, dir: String): DataFrame = {
    val root = landedMergedTable(s, dir)
    val head = latestVersion(root)
    val base = readSnapshot(s, root, head - 1)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n0"))
    val delta = readChanges(s, root, head - 1, head, "o_orderkey")
      .groupBy("o_orderstatus")
      .agg(sum(
        when(col("change_type").isin("insert", "update_postimage"), 1L)
          .otherwise(-1L)).as("d"))
    base.join(delta, Seq("o_orderstatus"), "full")
      .select(col("o_orderstatus"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("d"), lit(0L))).as("n"))
      .filter(col("n") > 0)
      .orderBy("o_orderstatus")
  }

  /** Landed SCHEMA-EVOLUTION fixture: v0 appends the odd-key orders as
    * (o_orderkey, o_orderstatus); v1 appends the even-key rows WITH the
    * o_orderpriority column the first producer didn't know about. Key
    * arithmetic only, so the oracle recomputes the evolved head from
    * `orders` alone.
    */
  private val evoCache = TrieMap.empty[(SparkSession, String), String]

  private def landedEvolvedTable(s: SparkSession, dir: String): String =
    evoCache.getOrElseUpdate((s, dir), {
      val root = Files.createTempDirectory("graft_table_evo").toString
      val orders = Sources.table(s, dir, "orders")
      append(orders.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_orderstatus")), root)
      append(orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority")), root)
      root
    })

  /** Aggregate over the EVOLVED head: per-status row counts plus how
    * many rows carry the late-added column (exactly the even-key half —
    * the odd half null-backfills) and its distinct values among them.
    * Proves union-schema resolution + null backfill end-to-end through
    * the manifest log, hash-checked against the recompute.
    */
  private def qTableEvolution(s: SparkSession, dir: String): DataFrame =
    readSnapshot(s, landedEvolvedTable(s, dir))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        count(col("o_orderpriority")).as("n_with_priority"),
        countDistinct(col("o_orderpriority")).as("n_priorities"))
      .orderBy("o_orderstatus")

  private[graft] def clearMemos(): Unit = {
    tableCache.keys.toList.foreach(tableCache.remove)
    rangeCache.keys.toList.foreach(rangeCache.remove)
    mergeCache.keys.toList.foreach(mergeCache.remove)
    evoCache.keys.toList.foreach(evoCache.remove)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_table_snapshot" -> qTableSnapshot,
      "q_table_skipping" -> qTableSkipping,
      "q_table_merge" -> qTableMerge,
      "q_table_changes" -> qTableChanges,
      "q_table_mv" -> qTableMv,
      "q_table_evolution" -> qTableEvolution)

  val oracleSql: Map[String, String] = Map(
    // evolved head = odd half without the late column (NULL backfill) ∪
    // even half with it — the CASE reproduces the union-schema read
    "q_table_evolution" ->
      """WITH evolved AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 2 = 0 THEN o_orderpriority END
        |      AS o_orderpriority
        |  FROM orders)
        |SELECT o_orderstatus, count(*) AS n,
        |  CAST(count(o_orderpriority) AS BIGINT) AS n_with_priority,
        |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
        |FROM evolved GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // incremental == recompute: the MV query derives these counts from
    // base + change feed; the oracle recomputes them from the head
    "q_table_mv" ->
      """WITH b AS (SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi,
        |  (min(o_orderkey) + max(o_orderkey)) // 2 AS mid FROM orders),
        |merged AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 AND o_orderkey <= mid THEN 'U'
        |         ELSE o_orderstatus END AS o_orderstatus
        |  FROM orders, b
        |  UNION ALL
        |  SELECT o_orderkey + hi + 1, 'N' FROM orders, b
        |  WHERE o_orderkey % 97 = 0)
        |SELECT o_orderstatus, count(*) AS n FROM merged
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_table_changes" ->
      """WITH b AS (SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi,
        |  (min(o_orderkey) + max(o_orderkey)) // 2 AS mid FROM orders),
        |upd AS (SELECT o_orderkey FROM orders, b
        |  WHERE o_orderkey % 7 = 0 AND o_orderkey <= mid
        |    AND o_orderstatus <> 'U'),
        |ch AS (
        |  SELECT o_orderkey, 'update_preimage' AS change_type FROM upd
        |  UNION ALL
        |  SELECT o_orderkey, 'update_postimage' FROM upd
        |  UNION ALL
        |  SELECT o_orderkey + hi + 1, 'insert' FROM orders, b
        |  WHERE o_orderkey % 97 = 0)
        |SELECT change_type, count(*) AS n, min(o_orderkey) AS min_key,
        |  max(o_orderkey) AS max_key
        |FROM ch GROUP BY change_type ORDER BY change_type""".stripMargin,
    "q_table_merge" ->
      """WITH b AS (SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi,
        |  (min(o_orderkey) + max(o_orderkey)) // 2 AS mid FROM orders),
        |merged AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 AND o_orderkey <= mid THEN 'U'
        |         ELSE o_orderstatus END AS o_orderstatus
        |  FROM orders, b
        |  UNION ALL
        |  SELECT o_orderkey + hi + 1, 'N' FROM orders, b
        |  WHERE o_orderkey % 97 = 0)
        |SELECT o_orderstatus, count(*) AS n FROM merged
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_table_skipping" ->
      """WITH m AS (SELECT (min(o_orderkey) + max(o_orderkey)) // 2 AS mid
        |  FROM orders)
        |SELECT o_orderstatus, count(*) AS n
        |FROM orders, m WHERE o_orderkey <= mid
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_table_snapshot" ->
      """WITH v0 AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
        |v1 AS (SELECT * FROM orders)
        |SELECT a.o_orderstatus,
        |  coalesce(b.n_v0, 0) AS n_v0, a.n_v1
        |FROM (SELECT o_orderstatus, count(*) AS n_v1 FROM v1 GROUP BY 1) a
        |LEFT JOIN (SELECT o_orderstatus, count(*) AS n_v0 FROM v0
        |  GROUP BY 1) b USING (o_orderstatus)
        |ORDER BY o_orderstatus""".stripMargin)
}
