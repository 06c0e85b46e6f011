package graft.io

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Input/output adapters.
  *
  * The reference ETL reads a legacy MySQL database and writes into an
  * OpenMRS MySQL schema over one connection per side (reference
  * `README.md:5`, `README.md:48`). This environment has no MySQL, so the
  * JDBC paths below are fully coded and scale-documented but exercised only
  * through their parquet stand-ins (FIXTURES.md §2); the parquet loaders are
  * what every verified query uses.
  */
object Sources {

  /** Parquet table loader for the testdata layout `<dir>/<name>.parquet`.
    * Columnar scan: Catalyst pushes projections and predicates into the
    * vectorized parquet reader, so downstream `select`/`filter` prune I/O.
    *
    * `events.ts` arrives in whatever physical form the generator used, and
    * the contract here is ONE logical type downstream: session-zone
    * `TimestampType` truncated to microseconds, bit-identical to what
    * DuckDB sees on the same file (FIXTURES.md §3). Observed generator
    * layouts, all normalized here by inspecting the resolved read schema:
    *   - TIMESTAMP(NANOS) → Spark 4 rejects it outright
    *     (PARQUET_TYPE_ILLEGAL), so we read it as a raw nanosecond long
    *     (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to µs;
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false) → Spark reads
    *     TIMESTAMP_NTZ (`inferTimestampNTZ` default); cast to
    *     TimestampType — the session runs UTC, so the wall-clock values
    *     match DuckDB's naive read exactly;
    *   - TIMESTAMP(MICROS, adjusted) → already TimestampType, pass through.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // Resolve the schema WITHOUT the legacy flag first (round-12 ADVICE):
      // only a genuine TIMESTAMP(NANOS) file fails that resolution, so the
      // nanos→µs division is gated on the one layout it is correct for. A
      // generator writing plain un-annotated INT64 (epoch-micros, millis,
      // who knows) also resolves to LongType UNDER the flag — the round-12
      // code would have silently divided those by 1000; now any resolved
      // type outside the three documented layouts fails loudly at read
      // time instead of producing subtly shifted timestamps.
      val path = s"$dir/$name.parquet"
      // The legacy nanosAsLong flag is session-global and set by the
      // flagged read below, so the no-flag probe must not interleave with
      // a concurrent flagged read on the same session (the probe would
      // observe the flag, resolve ts as LongType, and take the loud-fail
      // branch). The whole resolve-then-read sequence holds the session
      // lock, not just the flagged half.
      spark.synchronized {
      val noFlag =
        try {
          val raw = spark.read.parquet(path)
          raw.schema("ts").dataType match {
            case org.apache.spark.sql.types.TimestampNTZType =>
              Some(raw.withColumn("ts",
                org.apache.spark.sql.functions.col("ts")
                  .cast(org.apache.spark.sql.types.TimestampType)))
            case org.apache.spark.sql.types.TimestampType => Some(raw)
            case other => throw new IllegalStateException(
              s"events.ts resolved to unexpected type $other: not one of " +
                "the documented generator layouts (TIMESTAMP NANOS / " +
                "MICROS-NTZ / MICROS-adjusted) — refusing to guess its " +
                "unit; extend Sources.table with the new layout explicitly")
          }
        } catch {
          // Spark 4 rejects TIMESTAMP(NANOS) at schema resolution
          // (PARQUET_TYPE_ILLEGAL / "Illegal Parquet type"); that specific
          // failure routes to the flagged nanos read below — anything else
          // propagates
          case e: Exception
              if String.valueOf(e.getMessage).contains("Parquet type") ||
                String.valueOf(e.getMessage)
                  .contains("PARQUET_TYPE_ILLEGAL") =>
            None
        }
      noFlag.getOrElse {
        // The flag only affects schema resolution, which happens inside
        // this block; executing the returned plan later needs no flag.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try {
          val raw = spark.read.parquet(path)
          require(raw.schema("ts").dataType ==
            org.apache.spark.sql.types.LongType,
            s"events.ts: no-flag read failed as NANOS but flagged read " +
              s"resolved ${raw.schema("ts").dataType}, not LongType")
          // ns→µs with INTEGER division (`div`): `/ 1000` is double
          // division in Spark, and epoch-nanos (~1.8e18) exceed
          // double's 2^53 exact range, so the round-trip could land
          // ±1 µs off DuckDB's exact truncation near µs boundaries
          // (round-1 ADVICE, medium).
          raw.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts div 1000")))
        } finally {
          // scope the legacy flag to this read: later TIMESTAMP(NANOS)
          // reads elsewhere should fail loudly, not silently come back
          // as longs
          spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        }
      }
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** CSV source (header + schema inference off by default at scale: pass an
    * explicit schema to avoid a full pre-scan of 100 TB of text).
    */
  def csv(spark: SparkSession, path: String,
          schemaDdl: Option[String] = None): DataFrame = {
    val base = spark.read.option("header", "true")
    schemaDdl.fold(base.option("inferSchema", "true"))(base.schema)
      .csv(path)
  }

  /** ORC source — the columnar alternative when the lake standard is ORC
    * rather than parquet. Same pushdown story: Catalyst sends predicates
    * and column pruning into the vectorized ORC reader, so the operator
    * layer above is format-agnostic. Spec-covered round-trip (the DuckDB
    * oracle cannot read ORC, so no `q_*` form applies).
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JSON-lines source; same explicit-schema guidance as [[csv]]. */
  def json(spark: SparkSession, path: String,
           schemaDdl: Option[String] = None): DataFrame = {
    val base = spark.read
    schemaDdl.fold(base)(base.schema).json(path)
  }

  /** S5 verified query: schema-on-read JSON ingest. `events.props` is a
    * JSON document column; `from_json` with an EXPLICIT schema parses it
    * into a typed struct in one codegen'd pass — the same parse path
    * `spark.read.json` uses per line, so this is the oracle-checkable twin
    * of the JSON-lines reader ([[json]], whose file round-trip is
    * spec-covered). Explicit schema is the scale rule: schema inference
    * pre-scans the corpus (a full extra pass at 100 TB).
    */
  private def qSrcJson(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events")
      .select(col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).as("rec"))
      .select(col("event_id"), col("rec.k").as("k"),
        (col("rec.k") % 10).as("k_mod"))
      .orderBy("event_id")

  /** S5 verified query, CSV half: format each event as a CSV line, then
    * parse it back with `from_csv` + an explicit schema — the same
    * Univocity parse path `spark.read.csv` runs per line (whose file-level
    * round-trip is spec-covered in `SourcesSpec`), but oracle-checkable
    * because the line is derived from a parquet table both engines see.
    * The DuckDB oracle formats and re-parses with its own string ops, so
    * the hash compare proves the format→parse round-trip is lossless in
    * BOTH engines (doubles round-trip exactly through shortest-repr text).
    * Unquoted fields only: `events` has no nulls/commas/quotes in these
    * columns (checked), and quote-dialect semantics are not portable.
    */
  private def qSrcCsv(s: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "eid BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
    table(s, dir, "events")
      .select(col("event_id"),
        concat_ws(",", col("event_id"), col("user_id"), col("event_type"),
          col("value")).as("line"))
      .select(col("event_id"),
        from_csv(col("line"), schema, Map.empty[String, String]).as("rec"))
      .select(col("event_id"), col("rec.user_id").as("user_id"),
        col("rec.event_type").as("event_type"), col("rec.value").as("value"))
      .orderBy("event_id")
  }

  /** Content fingerprint of `<dir>/<name>.parquet`: md5 over the sorted
    * (file name, size, mtime) walk, truncated to 12 hex chars. Keys every
    * /tmp derived-layout cache (partitioned events, media fixtures) so a
    * REGENERATED testdata dir can never silently reuse a stale copy while
    * the oracle reads the live table (round-5 ADVICE).
    */
  private[graft] def fingerprint(dir: String, name: String): String = {
    def walk(f: java.io.File): Seq[String] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.sortBy(_.getName).flatMap(walk)
      else Seq(s"${f.getName}:${f.length}:${f.lastModified}")
    java.security.MessageDigest.getInstance("MD5")
      .digest(walk(new java.io.File(s"$dir/$name.parquet"))
        .mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
  }

  /** Path of the date-partitioned `events` copy for `dir`, written once by
    * [[partitionedEvents]] — keyed on the sf dir (different scale factors
    * never share a copy) AND the source table's content [[fingerprint]]
    * (a regenerated source invalidates the path instead of being silently
    * shadowed by the stale copy's _SUCCESS sentinel).
    */
  private[graft] def partitionedEventsPath(dir: String): String =
    "/tmp/graft_part_events_" + dir.replaceAll("[^A-Za-z0-9]", "_") +
      "_" + fingerprint(dir, "events")

  /** Hive-partitioned copy of `events` (partition column `event_date`),
    * written through [[Layout.writePartitioned]] on first use. This is the
    * at-rest layout a 100 TB event lake uses: one directory per day, so a
    * day predicate prunes directories BEFORE any I/O is scheduled.
    */
  private[graft] def partitionedEvents(s: SparkSession, dir: String): DataFrame = {
    val path = partitionedEventsPath(dir)
    // synchronized like the media fixtures: two threads racing the first
    // write would interleave overwrites of the same directory
    this.synchronized {
      if (!new java.io.File(path, "_SUCCESS").exists()) {
        Layout.writePartitioned(
          table(s, dir, "events")
            .withColumn("event_date", to_date(col("ts"))),
          path, Seq("event_date"))
      }
    }
    s.read.parquet(path)
  }

  /** S-layout verified query: static partition pruning over the
    * date-partitioned events copy. The `event_date = '2024-01-07'` filter
    * binds to the partition column, so it lands in the scan's
    * `PartitionFilters` (directory pruning — 1 of 30 day-dirs read, no
    * row-level I/O elsewhere); `SourcesSpec` asserts that on the physical
    * plan, plus the dynamic (DPP) variant of the same pruning. The oracle
    * filters the ORIGINAL events table on the same derived date — the
    * partitioned copy holds exactly the same rows, so content equality
    * proves the layout round-trip while the plan assertion proves the
    * pruning.
    */
  private def qSrcPartitioned(s: SparkSession, dir: String): DataFrame =
    partitionedEvents(s, dir)
      .filter(col("event_date") === lit("2024-01-07").cast("date"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("event_date"))
      .orderBy("event_id")

  /** S-robustness verified query: malformed-record tolerance on the
    * schema-on-read path. One in seven JSON documents is truncated to a
    * syntactically invalid prefix; `from_json` in PERMISSIVE mode (the
    * default, and the only sane 100 TB setting) yields a NULL struct for
    * the bad rows instead of failing the job, so the pipeline can
    * quarantine them (`is_bad`) and continue — a single corrupt document
    * in a trillion must never kill the run. The FAILFAST counterpoint
    * (throw on first bad record) is spec-covered in `SourcesSpec`.
    */
  private def qSrcBadRecords(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events")
      .select(col("event_id"),
        when(col("event_id") % 7 === 0, substring(col("props"), 1, 5))
          .otherwise(col("props")).as("line"))
      .select(col("event_id"),
        // the canonical quarantine pattern: a _corrupt_record field in the
        // read schema captures the raw line iff the parse failed
        from_json(col("line"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "k BIGINT, _corrupt_record STRING"),
          Map("columnNameOfCorruptRecord" -> "_corrupt_record")).as("rec"))
      .select(col("event_id"), col("rec.k").as("k"),
        col("rec._corrupt_record").isNotNull.as("is_bad"))
      .orderBy("event_id")

  /** Z-order key computation over orders — the value half of the
    * clustered-layout story ([[Layout.mortonKey]] has the why; `ZOrderSpec`
    * lands the layout and proves the skipping effect). Dimensions:
    * customer key × order day — the "who × when" box every account-
    * activity query carves. One tiny min/max aggregate broadcasts back
    * as the ranking frame; the key itself is scan-side shift/mask
    * arithmetic. Verified hash-for-hash against DuckDB evaluating the
    * identical interleave, so the layout tier's sort key is engine-
    * portable, not a Spark implementation detail.
    */
  private def qLayoutZorder(s: SparkSession, dir: String): DataFrame = {
    val dims = table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey").as("x"),
        datediff(col("o_orderdate").cast(org.apache.spark.sql.types.DateType),
          to_date(lit("1970-01-01"))).cast("long").as("y"))
    val stats = dims.agg(
      min("x").as("xmin"), max("x").as("xmax"),
      min("y").as("ymin"), max("y").as("ymax"))
    dims.crossJoin(broadcast(stats))
      .select(col("o_orderkey"),
        Layout.mortonKey(
          Layout.zRank(col("x"), col("xmin"), col("xmax"), 16),
          Layout.zRank(col("y"), col("ymin"), col("ymax"), 16),
          16).as("zkey"))
      .orderBy("o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_src_json" -> qSrcJson, "q_src_csv" -> qSrcCsv,
      "q_src_partitioned" -> qSrcPartitioned,
      "q_src_badrecords" -> qSrcBadRecords,
      "q_layout_zorder" -> qLayoutZorder)

  val oracleSql: Map[String, String] = Map(
    "q_layout_zorder" ->
      s"""WITH dims AS (SELECT o_orderkey,
         |    CAST(o_custkey AS BIGINT) AS x,
         |    CAST(date_diff('day', DATE '1970-01-01',
         |      CAST(o_orderdate AS DATE)) AS BIGINT) AS y
         |  FROM orders),
         |st AS (SELECT min(x) AS xmin, max(x) AS xmax,
         |    min(y) AS ymin, max(y) AS ymax FROM dims),
         |r AS (SELECT o_orderkey,
         |    CAST(floor((x - xmin) * 65536.0 / (xmax - xmin + 1)) AS BIGINT)
         |      AS rx,
         |    CAST(floor((y - ymin) * 65536.0 / (ymax - ymin + 1)) AS BIGINT)
         |      AS ry
         |  FROM dims, st)
         |SELECT o_orderkey,
         |CAST(${graft.io.Layout.mortonKeySql("rx", "ry", 16)} AS BIGINT)
         |  AS zkey
         |FROM r ORDER BY o_orderkey""".stripMargin,
    "q_src_json" ->
      """SELECT event_id,
        |CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
        |FROM events ORDER BY event_id""".stripMargin,
    "q_src_csv" ->
      """WITH lines AS (SELECT event_id,
        |  CAST(event_id AS VARCHAR) || ',' || CAST(user_id AS VARCHAR)
        |    || ',' || event_type || ',' || CAST(value AS VARCHAR) AS line
        |  FROM events)
        |SELECT event_id,
        |CAST(string_split(line, ',')[2] AS BIGINT) AS user_id,
        |string_split(line, ',')[3] AS event_type,
        |CAST(string_split(line, ',')[4] AS DOUBLE) AS value
        |FROM lines ORDER BY event_id""".stripMargin,
    "q_src_partitioned" ->
      """SELECT event_id, user_id, event_type, value,
        |CAST(ts AS DATE) AS event_date
        |FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-07'
        |ORDER BY event_id""".stripMargin,
    "q_src_badrecords" ->
      """WITH l AS (SELECT event_id,
        |  CASE WHEN event_id % 7 = 0 THEN substr(props, 1, 5)
        |       ELSE props END AS line FROM events)
        |SELECT event_id,
        |CASE WHEN json_valid(line)
        |  THEN CAST(json_extract_string(line, '$.k') AS BIGINT) END AS k,
        |NOT json_valid(line) AS is_bad
        |FROM l ORDER BY event_id""".stripMargin)

  /** Partitioned JDBC read — the scale path for the reference's source scan
    * (reference `README.md:5`: single mysql-connector cursor). Splitting on
    * a numeric key turns the one-cursor scan into `numPartitions` parallel
    * range scans, one per executor task; `fetchsize` batches the wire
    * protocol instead of row-at-a-time fetches.
    */
  def jdbcRead(spark: SparkSession, url: String, table: String,
               partitionColumn: String, lowerBound: Long, upperBound: Long,
               numPartitions: Int,
               props: Properties = new Properties()): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound.toString)
      .option("upperBound", upperBound.toString)
      .option("numPartitions", numPartitions.toString)
      .option("fetchsize", "10000")
      .load()

  /** Append to a JDBC sink in FK dependency order — the batch replacement
    * for the reference's per-row INSERT loop (reference `README.md:7-17`:
    * ≥7 statements and round-trips per client). `batchsize` turns that into
    * bulk inserts; idempotent re-runs should instead stage into a temp table
    * and MERGE (see [[graft.stream.Streaming.foreachBatchUpsert]]).
    */
  def jdbcAppend(df: DataFrame, url: String, table: String,
                 props: Properties = new Properties()): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", "10000")
      .option("isolationLevel", "READ_COMMITTED")
      .mode("append")
      .save()
}
