package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

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
  * Commit protocol: write the new data dir, then write `v<N>.json` via
  * temp-file + ATOMIC_MOVE. The manifest move is the commit point — a
  * reader either sees v<N> complete or not at all; a crashed writer
  * leaves an orphan data dir that no manifest references (invisible, GC
  * fodder), never a torn snapshot. Readers NEVER list `data/`: snapshot N
  * is exactly the files `v<N>.json` names, which is what makes time
  * travel O(1) metadata and makes concurrent writers serializable by
  * manifest-version CAS (ATOMIC_MOVE fails if v<N> exists — the loser
  * retries at N+1).
  *
  * Scale: a 100 TB table is ~10⁵-10⁶ data files; the manifest stays a
  * file LIST (KB-MB of metadata per commit, written once, never
  * rewritten per-file like hive-style rename commits). Snapshot reads
  * pass the explicit file list to the parquet reader, so partition
  * pruning and pushdown work unchanged. What this slice deliberately
  * omits from the full formats: column stats per file (data skipping),
  * compaction, and deletes — SURVEY §4 documents those as design-scoped.
  */
object TableFormat {

  private def manifestDir(root: String): Path = Paths.get(root, "manifest")

  /** Latest committed version, or -1 for an empty/absent table. */
  def latestVersion(root: String): Int = {
    val dir = manifestDir(root)
    if (!Files.isDirectory(dir)) return -1
    Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toInt }
      .foldLeft(-1)(math.max)
  }

  private def readManifest(root: String, v: Int): Seq[String] = {
    val f = manifestDir(root).resolve(s"v$v.json")
    require(Files.exists(f), s"no snapshot v$v at $root")
    // one JSON array of data-dir strings per line-less file; parsed
    // without a JSON library (none in the dependency set) — the writer
    // below is the only producer, so the quoting is under our control
    val s = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
    s.split("\"").zipWithIndex.collect {
      case (p, i) if i % 2 == 1 => p
    }.toSeq
  }

  private def writeManifest(root: String, v: Int,
                            dirs: Seq[String]): Unit = {
    Files.createDirectories(manifestDir(root))
    val body = dirs.map(d => "\"" + d + "\"").mkString("[", ",", "]")
    val tmp = Files.createTempFile(manifestDir(root), s"v$v", ".tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    // ATOMIC_MOVE is the commit: it either installs v<N> whole or throws
    // (FileAlreadyExistsException = lost the CAS race — caller retries)
    Files.move(tmp, manifestDir(root).resolve(s"v$v.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Append `df` as a new snapshot: new immutable data dir + manifest
    * v(latest+1) = previous dirs ++ the new one. Returns the committed
    * version.
    */
  def append(df: DataFrame, root: String): Int = {
    val dataDir = s"$root/data/${java.util.UUID.randomUUID()}"
    df.write.parquet(dataDir)
    val prev = latestVersion(root)
    val dirs =
      (if (prev < 0) Seq.empty else readManifest(root, prev)) :+ dataDir
    val v = prev + 1
    writeManifest(root, v, dirs)
    v
  }

  /** Read snapshot `version` (default: latest). Time travel = pick an
    * older manifest; the data dirs are immutable so the old snapshot is
    * byte-identical to when it was committed.
    */
  def readSnapshot(spark: SparkSession, root: String,
                   version: Int = -1): DataFrame = {
    val v = if (version < 0) latestVersion(root) else version
    val dirs = readManifest(root, v)
    spark.read.parquet(dirs: _*)
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

  private[graft] def clearMemos(): Unit =
    tableCache.keys.toList.foreach(tableCache.remove)

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_table_snapshot" -> qTableSnapshot)

  val oracleSql: Map[String, String] = Map(
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
