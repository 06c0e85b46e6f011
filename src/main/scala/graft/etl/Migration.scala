package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType, LongType, StringType}

import graft.io.Sources

/** The reference's full capability surface (SURVEY.md §2.2/§2.10), rebuilt
  * as declarative DataFrame transforms over the `customer` stand-in roster
  * (FIXTURES.md §2). Where the reference loops row-at-a-time over a MySQL
  * cursor issuing ≥7 INSERTs per client (reference `README.md:7-19`), every
  * function here is a single whole-stage-codegen'd pipeline: at 100 TB the
  * only shuffle any of them needs is the one global sort used to mint
  * deterministic surrogate keys — and that one is explicitly flagged below.
  *
  * Determinism contract (SURVEY.md §7.4): no `uuid()` — verified queries
  * derive content-addressed ids via `md5(concat_ws(...))`, which also makes
  * re-runs idempotent (an improvement over the reference's fresh-UUID-per-
  * run semantics, reference `README.md:19`); every output ends in a total
  * ORDER BY on a unique key.
  */
object Migration {

  private def customer(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "customer")

  /** Luhn mod-30 check digit — the public OpenMRS idgen algorithm implied by
    * the reference's "generated patient ID" fallback (reference
    * `README.md:15`). The kernel lives in
    * [[graft.functions.LuhnMod30Fn]]; the HOT paths use the codegen'd
    * [[graft.functions.LuhnExprs.luhnMod30]] expression (round-8 VERDICT
    * stretch — no encoder boundary, no per-row closure dispatch), while
    * this UDF form stays as the SURVEY §2.10 U1 exhibit and the spec
    * cross-check that expression and UDF agree value-for-value.
    */
  val Mod30Chars: String = graft.functions.LuhnMod30Fn.Chars

  def luhnMod30(id: String): String =
    graft.functions.LuhnMod30Fn.computeString(id)

  val luhnMod30Udf = udf(luhnMod30 _)

  /** Deterministic content-derived id (SURVEY.md §2.2 P4). */
  def detUuid(cols: Column*): Column =
    md5(concat_ws("|", cols: _*))

  /** Production-parity uuid flag (SURVEY.md §7.3, reference `README.md:19`):
    * with `graft.migration.prodUuid=true` in the session conf, [[mintUuid]]
    * mints real random RFC-4122 v4 uuids (`uuid()`), matching the
    * reference's fresh-UUID-per-run semantics. Default (flag unset) is the
    * deterministic content-derived id — idempotent re-runs, oracle-checkable
    * outputs. `MigrationSpec` proves the flagged run yields RFC-4122-shaped
    * uuids with identical keys/row counts to the deterministic run.
    */
  val ProdUuidFlag = "graft.migration.prodUuid"

  def mintUuid(s: SparkSession, cols: Column*): Column =
    if (s.conf.getOption(ProdUuidFlag).contains("true")) expr("uuid()")
    else detUuid(cols: _*)

  // ---------------------------------------------------------------------
  // P1 projection / rename
  private def qProject(s: SparkSession, dir: String): DataFrame =
    customer(s, dir)
      .select(
        col("c_custkey").as("client_id"),
        col("c_name").as("full_name"),
        col("c_mktsegment").as("segment"))
      .orderBy("client_id")

  // P2 filter (pushed into the parquet scan by Catalyst)
  private def qFilter(s: SparkSession, dir: String): DataFrame =
    customer(s, dir)
      .filter(col("c_acctbal") > 1000 && col("c_mktsegment") === "FURNITURE")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")

  // P3 identifier priority fallback (reference README.md:13-15)
  private def qIdentFallback(s: SparkSession, dir: String): DataFrame =
    customer(s, dir)
      .select(
        col("c_custkey").as("client_id"),
        when(col("c_custkey") % 3 === 0,
          concat(lit("NAT-"), col("c_custkey").cast(StringType)))
          .as("national_id"),
        when(col("c_custkey") % 2 === 0,
          concat(lit("BC-"), col("c_custkey").cast(StringType)))
          .as("birth_certificate"))
      .withColumn("identifier",
        coalesce(col("national_id"), col("birth_certificate"),
          concat(lit("GEN-"), col("client_id").cast(StringType))))
      .withColumn("identifier_type",
        when(col("national_id").isNotNull, "national_id")
          .when(col("birth_certificate").isNotNull, "birth_certificate")
          .otherwise("generated"))
      .orderBy("client_id")

  // P4 deterministic uuid
  private def qDetUuid(s: SparkSession, dir: String): DataFrame =
    customer(s, dir)
      .select(
        col("c_custkey").as("client_id"),
        detUuid(lit("person"), col("c_custkey"), col("c_name")).as("uuid"))
      .orderBy("client_id")

  /** P5 surrogate keys. `row_number` over a global order replaces MySQL
    * AUTO_INCREMENT (reference `README.md:17` reads lastrowid per insert).
    * Scale note: a single global window is a one-partition sort — correct
    * tier only; [[surrogateKeysScaled]] below is the 100 TB formulation
    * and `q_surrogate_key_scaled` verifies it against the same oracle.
    * `monotonically_increasing_id` is banned in verified queries
    * (partition-layout-dependent, SURVEY.md §7.3).
    */
  private def qSurrogateKey(s: SparkSession, dir: String): DataFrame =
    customer(s, dir)
      .select(
        row_number().over(Window.orderBy("c_custkey")).cast(LongType)
          .as("person_id"),
        col("c_custkey").as("client_id"))
      .orderBy("person_id")

  /** Scale path for P5: `zipWithIndex`-style partition-offset minting,
    * expressed declaratively so it stays a lazy, optimizable plan.
    *
    * 1. `repartitionByRange(order)` — partition i holds keys strictly below
    *    partition i+1's (one shuffle, the same one a global sort would pay).
    * 2. `row_number` windowed BY PARTITION ID — every window is one range
    *    partition, so the sort is parallel across the cluster; nothing ever
    *    funnels through a single task, unlike `Window.orderBy(key)`.
    * 3. Per-partition row counts → running offsets (a window over ≤ nParts
    *    rows — trivially small) broadcast-joined back: id = offset + local
    *    row number.
    *
    * The result is layout-INdependent even though `spark_partition_id` is
    * layout-dependent: wherever the sampled range boundaries fall, offset +
    * local rank telescopes to the global rank of `order`, which is unique
    * and dense by construction. Requires a unique order key (ties would
    * make the rank assignment arbitrary — same caveat as `row_number`).
    * No driver action anywhere: unlike RDD `zipWithIndex` (whose offset
    * scan is an eager job), the offsets here are a plan node.
    */
  def surrogateKeysScaled(df: DataFrame, order: Column,
                          idName: String): DataFrame = {
    // Persisted because BOTH branches below (local ranks, offsets) consume
    // it: without the persist each branch re-evaluates the range exchange,
    // and identical partition boundaries across the two evaluations would
    // rest on RangePartitioner's sampling being deterministic — an
    // implementation detail AQE replanning can break (round-3 ADVICE,
    // medium). One materialization makes the invariant structural. The
    // frame is registered in [[graft.Caches]] so `Dedup.clearCaches()`
    // (already called by the Verify/Bench mains) releases the blocks
    // deterministically instead of waiting on GC + ContextCleaner
    // (round-4 ADVICE).
    val parted = graft.Caches.register(
      df.repartitionByRange(order)
        .withColumn("__pid", spark_partition_id())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val local = parted.withColumn("__idx",
      row_number().over(Window.partitionBy("__pid").orderBy(order))
        .cast(LongType))
    val offsets = parted.groupBy("__pid")
      .agg(count(lit(1)).as("__n"))
      .select(col("__pid"),
        coalesce(sum(col("__n")).over(
          Window.orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .as("__off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(idName, col("__off") + col("__idx"))
      .drop("__pid", "__idx", "__off")
  }

  private def qSurrogateKeyScaled(s: SparkSession, dir: String): DataFrame =
    surrogateKeysScaled(customer(s, dir), col("c_custkey"), "person_id")
      .select(col("person_id"), col("c_custkey").as("client_id"))
      .orderBy("person_id")

  // P7 name cleaning / splitting (reference README.md:9)
  private def qNameSplit(s: SparkSession, dir: String): DataFrame =
    customer(s, dir)
      .select(
        col("c_custkey").as("client_id"),
        upper(trim(split(col("c_name"), "#").getItem(0))).as("given_name"),
        split(col("c_name"), "#").getItem(1).as("family_name"))
      .orderBy("client_id")

  // P9 / U1 check digit for generated identifiers
  private def qCheckDigit(s: SparkSession, dir: String): DataFrame = {
    val id = col("c_custkey").cast(StringType)
    customer(s, dir)
      .select(
        col("c_custkey").as("client_id"),
        id.as("id_str"),
        graft.functions.LuhnExprs.luhnMod30(id).as("check_char"))
      .withColumn("full_id", concat_ws("-", col("id_str"), col("check_char")))
      .orderBy("client_id")
  }

  /** Flagship: full person registration (P1+P2+P5+P6+P7+P8+P4) — one
    * codegen'd pipeline producing `person` ⋈ `person_name` shaped rows from
    * the legacy roster, versus the reference's 2 INSERTs + lastrowid
    * round-trip per client (reference `README.md:9,19`).
    *
    * `person_id` is minted by [[surrogateKeysScaled]] — range-repartitioned
    * parallel local sorts + broadcast offsets — so the showcase query
    * carries NO partition-unbounded window: every windowspecdefinition in
    * its plan is either partitioned by `__pid` (one range partition per
    * window) or the ≤-nParts-row offsets rollup. `MigrationSpec` asserts
    * this on the optimized plan; the oracle is unchanged (the scaled form
    * equals `ROW_NUMBER() OVER (ORDER BY c_custkey)` bit-for-bit).
    */
  private def qPerson(s: SparkSession, dir: String): DataFrame =
    surrogateKeysScaled(customer(s, dir), col("c_custkey"), "person_id")
      .select(
        col("person_id"),
        col("c_custkey").as("client_id"),
        upper(trim(split(col("c_name"), "#").getItem(0))).as("given_name"),
        split(col("c_name"), "#").getItem(1).as("family_name"),
        // gender normalization P8: legacy coding -> OpenMRS 'M'/'F'/null
        when(col("c_custkey") % 3 === 0, "M")
          .when(col("c_custkey") % 3 === 1, "F")
          .otherwise(lit(null).cast(StringType)).as("gender"),
        // date normalization P6: derived deterministic birthdate
        date_add(to_date(lit("1950-01-01")),
          ((col("c_custkey") * 37) % 18250).cast(IntegerType))
          .as("birthdate"),
        (col("c_custkey") % 5 === 0).as("birthdate_estimated"),
        lit(1L).as("creator"),
        lit(false).as("voided"),
        mintUuid(s, lit("person"), col("c_custkey"), col("c_name")).as("uuid"))
      .orderBy("person_id")

  /** U3 unpivot: wide legacy row -> `person_attribute` EAV rows (reference
    * `README.md:11`), 1 row in -> 3 rows out via a generator, no shuffle.
    */
  private def qUnpivot(s: SparkSession, dir: String): DataFrame =
    customer(s, dir)
      .select(
        col("c_custkey").as("person_id"),
        explode(array(
          struct(lit("acctbal").as("attr_type"),
            col("c_acctbal").cast(DecimalType(12, 2)).cast(StringType)
              .as("value")),
          struct(lit("mktsegment").as("attr_type"),
            col("c_mktsegment").as("value")),
          struct(lit("nation").as("attr_type"),
            col("c_nationkey").cast(StringType).as("value")))).as("a"))
      .select(col("person_id"), col("a.attr_type"), col("a.value"))
      .orderBy("person_id", "attr_type")

  /** A6 pivot: EAV rows -> wide person attributes (inverse of [[qUnpivot]]).
    * Explicit pivot values keep the plan one-pass (no value-discovery scan)
    * — at 100 TB an unspecified `pivot()` would scan the fact twice.
    */
  private def qPivot(s: SparkSession, dir: String): DataFrame =
    qUnpivot(s, dir)
      .groupBy("person_id")
      .pivot("attr_type", Seq("acctbal", "mktsegment", "nation"))
      .agg(first("value"))
      .orderBy("person_id")

  // ---------------------------------------------------------------------
  // Full FK-ordered migration bundle (reference README.md:7-17)

  /** The seven OpenMRS tables one reference run inserts — person,
    * person_name, person_address, person_attribute, patient,
    * patient_identifier, dreams_client_patient_mapping — produced as ONE
    * coherent bundle in FK dependency order. Where the reference loops ≥7
    * INSERTs + a lastrowid round-trip per client (reference
    * `README.md:7-17`), every table here is a declarative frame off ONE
    * shared keyed scan: `person_id` is minted once by
    * [[surrogateKeysScaled]] (the persisted range-partitioned frame), so
    * cross-table FK consistency is structural — no table re-derives the
    * key, and a [[graft.io.Sources.jdbcAppend]] over this Seq in order
    * satisfies every FK at insert time. uuids go through [[mintUuid]]:
    * deterministic by default, real `uuid()` under [[ProdUuidFlag]].
    */
  def migrateAll(s: SparkSession, dir: String): Seq[(String, DataFrame)] = {
    val nation = Sources.table(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val base = surrogateKeysScaled(customer(s, dir), col("c_custkey"),
      "person_id")
    val key = col("c_custkey")

    val person = base.select(
      col("person_id"),
      key.as("client_id"),
      upper(trim(split(col("c_name"), "#").getItem(0))).as("given_name"),
      split(col("c_name"), "#").getItem(1).as("family_name"),
      when(key % 3 === 0, "M").when(key % 3 === 1, "F")
        .otherwise(lit(null).cast(StringType)).as("gender"),
      date_add(to_date(lit("1950-01-01")),
        ((key * 37) % 18250).cast(IntegerType)).as("birthdate"),
      (key % 5 === 0).as("birthdate_estimated"),
      lit(1L).as("creator"),
      lit(false).as("voided"),
      mintUuid(s, lit("person"), key, col("c_name")).as("uuid"))

    val personName = base.select(
      col("person_id"),
      upper(trim(split(col("c_name"), "#").getItem(0))).as("given_name"),
      split(col("c_name"), "#").getItem(1).as("family_name"),
      lit(true).as("preferred"),
      mintUuid(s, lit("person_name"), key, col("c_name")).as("uuid"))

    val personAddress = base
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(
        col("person_id"),
        concat(lit("PLOT-"), (key % 997).cast(StringType)).as("address1"),
        col("n_name").as("city_village"),
        mintUuid(s, lit("person_address"), key).as("uuid"))

    val personAttribute = base
      .select(col("person_id"), key.as("ck"),
        explode(array(
          struct(lit("acctbal").as("attr_type"),
            col("c_acctbal").cast(DecimalType(12, 2)).cast(StringType)
              .as("value")),
          struct(lit("mktsegment").as("attr_type"),
            col("c_mktsegment").as("value")),
          struct(lit("nation").as("attr_type"),
            col("c_nationkey").cast(StringType).as("value")))).as("a"))
      .select(col("person_id"), col("a.attr_type").as("attr_type"),
        col("a.value").as("value"),
        mintUuid(s, lit("person_attribute"), col("ck"), col("a.attr_type"))
          .as("uuid"))

    val patient = base.select(
      col("person_id").as("patient_id"),
      lit(1L).as("creator"),
      lit(false).as("voided"),
      mintUuid(s, lit("patient"), key).as("uuid"))

    val patientIdentifier = base
      .withColumn("national_id", when(key % 3 === 0,
        concat(lit("NAT-"), key.cast(StringType))))
      .withColumn("birth_certificate", when(key % 2 === 0,
        concat(lit("BC-"), key.cast(StringType))))
      .select(
        col("person_id").as("patient_id"),
        coalesce(col("national_id"), col("birth_certificate"),
          concat(lit("GEN-"), key.cast(StringType), lit("-"),
            graft.functions.LuhnExprs.luhnMod30(key.cast(StringType))))
            .as("identifier"),
        when(col("national_id").isNotNull, "national_id")
          .when(col("birth_certificate").isNotNull, "birth_certificate")
          .otherwise("generated").as("identifier_type"),
        lit(true).as("preferred"),
        mintUuid(s, lit("patient_identifier"), key).as("uuid"))

    val mapping = base.select(
      key.as("client_id"),
      col("person_id").as("patient_id"),
      mintUuid(s, lit("dreams_mapping"), key).as("uuid"))

    Seq(
      "person" -> person,
      "person_name" -> personName,
      "person_address" -> personAddress,
      "person_attribute" -> personAttribute,
      "patient" -> patient,
      "patient_identifier" -> patientIdentifier,
      "dreams_client_patient_mapping" -> mapping)
  }

  /** Oracle-checkable projection of the whole bundle: every row of every
    * table reduced to (tbl, key, row_digest) where row_digest = md5 of the
    * '|'-joined string casts of ALL columns in declaration order — so the
    * driver's hash compare verifies the complete 7-table content, not just
    * counts. NULLs (only `gender`) are coalesced to a sentinel BEFORE the
    * join so both engines concatenate identical strings.
    */
  private def qMigrateBundle(s: SparkSession, dir: String): DataFrame = {
    val digests = migrateAll(s, dir).map { case (name, df) =>
      val all = df.columns.map(c =>
        coalesce(col(c).cast(StringType), lit("~null~")))
      df.select(lit(name).as("tbl"),
        col(df.columns.head).as("key"),
        md5(concat_ws("|", all.toIndexedSeq: _*)).as("row_digest"))
    }
    digests.reduce(_ unionByName _)
      .orderBy("tbl", "key", "row_digest")
  }

  /** Pre-migration data-quality audit — the constraint checks a real
    * migration runs BEFORE writing anything (the dbt-test / Deequ
    * pattern): primary-key uniqueness, referential integrity, null
    * checks, and domain bounds, each as one line of (constraint,
    * n_violations). Every check is a single aggregate or anti-join —
    * nothing here shuffles more than the checked keys — and the fixed
    * output shape means a scheduler can gate a 100 TB load on
    * `max(n_violations) == 0` without parsing anything. The counts are
    * data-derived on the clean TPC-H tables (mostly 0), which is itself
    * the assertion: the oracle recomputes each violation count
    * independently.
    */
  private def qQualityConstraints(s: SparkSession, dir: String): DataFrame = {
    val c = Sources.table(s, dir, "customer")
    val o = Sources.table(s, dir, "orders")
    val l = Sources.table(s, dir, "lineitem")
    def line(name: String, n: DataFrame): DataFrame =
      n.select(lit(name).as("constraint"), col("n").cast(LongType).as("n_violations"))
    val pkDup = c.groupBy("c_custkey").agg(count(lit(1)).as("k"))
      .filter(col("k") > 1).agg(count(lit(1)).as("n"))
    val fkOrphan = o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n"))
    val nullName = c.filter(col("c_name").isNull).agg(count(lit(1)).as("n"))
    val qtyDomain = l.filter(col("l_quantity") <= 0)
      .agg(count(lit(1)).as("n"))
    val discDomain = l.filter(col("l_discount") < 0 || col("l_discount") > 1)
      .agg(count(lit(1)).as("n"))
    line("customer_pk_unique", pkDup)
      .unionByName(line("orders_custkey_fk", fkOrphan))
      .unionByName(line("customer_name_not_null", nullName))
      .unionByName(line("lineitem_quantity_positive", qtyDomain))
      .unionByName(line("lineitem_discount_in_0_1", discDomain))
      .orderBy("constraint")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_quality_constraints" -> qQualityConstraints,
    "q_migrate_bundle" -> qMigrateBundle,
    "q_project" -> qProject,
    "q_filter" -> qFilter,
    "q_ident_fallback" -> qIdentFallback,
    "q_det_uuid" -> qDetUuid,
    "q_surrogate_key" -> qSurrogateKey,
    "q_surrogate_key_scaled" -> qSurrogateKeyScaled,
    "q_name_split" -> qNameSplit,
    "q_checkdigit" -> qCheckDigit,
    "q_person" -> qPerson,
    "q_unpivot" -> qUnpivot,
    "q_pivot" -> qPivot)

  /** Flagship query for the driver smoke check. */
  def entry(spark: SparkSession): DataFrame =
    qPerson(spark, "/root/testdata/sf0.001")

  val oracleSql: Map[String, String] = Map(
    "q_quality_constraints" ->
      """SELECT * FROM (
        |SELECT 'customer_pk_unique' AS constraint, CAST(
        |  (SELECT count(*) FROM (SELECT c_custkey FROM customer
        |    GROUP BY c_custkey HAVING count(*) > 1)) AS BIGINT)
        |  AS n_violations
        |UNION ALL
        |SELECT 'orders_custkey_fk', CAST(
        |  (SELECT count(*) FROM orders WHERE NOT EXISTS
        |    (SELECT 1 FROM customer WHERE c_custkey = o_custkey))
        |  AS BIGINT)
        |UNION ALL
        |SELECT 'customer_name_not_null', CAST(
        |  (SELECT count(*) FROM customer WHERE c_name IS NULL) AS BIGINT)
        |UNION ALL
        |SELECT 'lineitem_quantity_positive', CAST(
        |  (SELECT count(*) FROM lineitem WHERE l_quantity <= 0) AS BIGINT)
        |UNION ALL
        |SELECT 'lineitem_discount_in_0_1', CAST(
        |  (SELECT count(*) FROM lineitem WHERE l_discount < 0
        |    OR l_discount > 1) AS BIGINT)
        |) ORDER BY "constraint"""".stripMargin,
    // the full 7-table bundle, reduced to per-row digests: each arm
    // recomputes one table's columns and md5-joins them in the same
    // declaration order as the Spark side's concat_ws("|", ...)
    "q_migrate_bundle" ->
      """WITH base AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) AS BIGINT)
        |    AS pid, c_custkey AS ck, c_name, c_nationkey, c_acctbal,
        |    c_mktsegment
        |  FROM customer),
        |chk AS (SELECT ck AS ck2,
        |  substring('0123456789ACDEFGHJKLMNPRTUVWXY',
        |    CAST((30 - CAST(list_sum(list_transform(
        |      range(1, length(CAST(ck AS VARCHAR)) + 1), i ->
        |      CASE WHEN (length(CAST(ck AS VARCHAR)) - i) % 2 = 0
        |      THEN (CAST(substring(CAST(ck AS VARCHAR), i, 1) AS INT) * 2) // 30
        |         + (CAST(substring(CAST(ck AS VARCHAR), i, 1) AS INT) * 2) % 30
        |      ELSE CAST(substring(CAST(ck AS VARCHAR), i, 1) AS INT) END))
        |      AS BIGINT) % 30) % 30 AS INT) + 1, 1) AS c
        |  FROM base),
        |p AS (SELECT pid, ck,
        |    UPPER(TRIM(split_part(c_name, '#', 1))) AS gn,
        |    split_part(c_name, '#', 2) AS fn,
        |    CASE WHEN ck % 3 = 0 THEN 'M'
        |         WHEN ck % 3 = 1 THEN 'F' END AS gender,
        |    CAST(DATE '1950-01-01' + CAST((ck * 37) % 18250 AS INT)
        |      AS VARCHAR) AS bd,
        |    CAST(ck % 5 = 0 AS VARCHAR) AS est,
        |    c_name, c_nationkey, c_acctbal, c_mktsegment
        |  FROM base),
        |r AS (
        |  SELECT 'person' AS tbl, pid AS key,
        |    md5(CAST(pid AS VARCHAR) || '|' || CAST(ck AS VARCHAR) || '|'
        |      || gn || '|' || fn || '|' || COALESCE(gender, '~null~') || '|'
        |      || bd || '|' || est || '|1|false|'
        |      || md5('person|' || CAST(ck AS VARCHAR) || '|' || c_name))
        |      AS row_digest
        |  FROM p
        |  UNION ALL
        |  SELECT 'person_name', pid,
        |    md5(CAST(pid AS VARCHAR) || '|' || gn || '|' || fn || '|true|'
        |      || md5('person_name|' || CAST(ck AS VARCHAR) || '|' || c_name))
        |  FROM p
        |  UNION ALL
        |  SELECT 'person_address', pid,
        |    md5(CAST(pid AS VARCHAR) || '|PLOT-' || CAST(ck % 997 AS VARCHAR)
        |      || '|' || n.n_name || '|'
        |      || md5('person_address|' || CAST(ck AS VARCHAR)))
        |  FROM p JOIN nation n ON p.c_nationkey = n.n_nationkey
        |  UNION ALL
        |  SELECT 'person_attribute', pid,
        |    md5(CAST(pid AS VARCHAR) || '|acctbal|'
        |      || CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) || '|'
        |      || md5('person_attribute|' || CAST(ck AS VARCHAR) || '|acctbal'))
        |  FROM p
        |  UNION ALL
        |  SELECT 'person_attribute', pid,
        |    md5(CAST(pid AS VARCHAR) || '|mktsegment|' || c_mktsegment || '|'
        |      || md5('person_attribute|' || CAST(ck AS VARCHAR)
        |        || '|mktsegment'))
        |  FROM p
        |  UNION ALL
        |  SELECT 'person_attribute', pid,
        |    md5(CAST(pid AS VARCHAR) || '|nation|'
        |      || CAST(c_nationkey AS VARCHAR) || '|'
        |      || md5('person_attribute|' || CAST(ck AS VARCHAR) || '|nation'))
        |  FROM p
        |  UNION ALL
        |  SELECT 'patient', pid,
        |    md5(CAST(pid AS VARCHAR) || '|1|false|'
        |      || md5('patient|' || CAST(ck AS VARCHAR)))
        |  FROM p
        |  UNION ALL
        |  SELECT 'patient_identifier', pid,
        |    md5(CAST(pid AS VARCHAR) || '|'
        |      || COALESCE(
        |           CASE WHEN ck % 3 = 0 THEN 'NAT-' || CAST(ck AS VARCHAR) END,
        |           CASE WHEN ck % 2 = 0 THEN 'BC-' || CAST(ck AS VARCHAR) END,
        |           'GEN-' || CAST(ck AS VARCHAR) || '-' || chk.c) || '|'
        |      || CASE WHEN ck % 3 = 0 THEN 'national_id'
        |              WHEN ck % 2 = 0 THEN 'birth_certificate'
        |              ELSE 'generated' END || '|true|'
        |      || md5('patient_identifier|' || CAST(ck AS VARCHAR)))
        |  FROM p JOIN chk ON p.ck = chk.ck2
        |  UNION ALL
        |  SELECT 'dreams_client_patient_mapping', ck,
        |    md5(CAST(ck AS VARCHAR) || '|' || CAST(pid AS VARCHAR) || '|'
        |      || md5('dreams_mapping|' || CAST(ck AS VARCHAR)))
        |  FROM p)
        |SELECT tbl, key, row_digest FROM r
        |ORDER BY tbl, key, row_digest""".stripMargin,
    "q_project" ->
      """SELECT c_custkey AS client_id, c_name AS full_name,
        |c_mktsegment AS segment FROM customer ORDER BY client_id""".stripMargin,
    "q_filter" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_acctbal > 1000 AND c_mktsegment = 'FURNITURE'
        |ORDER BY c_custkey""".stripMargin,
    "q_ident_fallback" ->
      """SELECT client_id, national_id, birth_certificate,
        |COALESCE(national_id, birth_certificate,
        |         'GEN-' || CAST(client_id AS VARCHAR)) AS identifier,
        |CASE WHEN national_id IS NOT NULL THEN 'national_id'
        |     WHEN birth_certificate IS NOT NULL THEN 'birth_certificate'
        |     ELSE 'generated' END AS identifier_type
        |FROM (SELECT c_custkey AS client_id,
        |  CASE WHEN c_custkey % 3 = 0
        |       THEN 'NAT-' || CAST(c_custkey AS VARCHAR) END AS national_id,
        |  CASE WHEN c_custkey % 2 = 0
        |       THEN 'BC-' || CAST(c_custkey AS VARCHAR) END AS birth_certificate
        |  FROM customer) ORDER BY client_id""".stripMargin,
    "q_det_uuid" ->
      """SELECT c_custkey AS client_id,
        |md5('person' || '|' || CAST(c_custkey AS VARCHAR) || '|' || c_name)
        |  AS uuid
        |FROM customer ORDER BY client_id""".stripMargin,
    "q_surrogate_key" ->
      """SELECT CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) AS BIGINT)
        |  AS person_id, c_custkey AS client_id
        |FROM customer ORDER BY person_id""".stripMargin,
    // the scaled form must equal the single-window form bit-for-bit
    "q_surrogate_key_scaled" ->
      """SELECT CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) AS BIGINT)
        |  AS person_id, c_custkey AS client_id
        |FROM customer ORDER BY person_id""".stripMargin,
    "q_name_split" ->
      """SELECT c_custkey AS client_id,
        |UPPER(TRIM(split_part(c_name, '#', 1))) AS given_name,
        |split_part(c_name, '#', 2) AS family_name
        |FROM customer ORDER BY client_id""".stripMargin,
    "q_checkdigit" ->
      """WITH t AS (SELECT c_custkey AS client_id,
        |  CAST(c_custkey AS VARCHAR) AS id_str FROM customer),
        |s AS (SELECT client_id, id_str,
        |  CAST(list_sum(list_transform(range(1, length(id_str) + 1), i ->
        |    CASE WHEN (length(id_str) - i) % 2 = 0
        |    THEN (CAST(substring(id_str, i, 1) AS INT) * 2) // 30
        |       + (CAST(substring(id_str, i, 1) AS INT) * 2) % 30
        |    ELSE CAST(substring(id_str, i, 1) AS INT) END)) AS BIGINT)
        |    AS luhn_sum
        |  FROM t)
        |SELECT client_id, id_str,
        |  substring('0123456789ACDEFGHJKLMNPRTUVWXY',
        |            CAST((30 - luhn_sum % 30) % 30 AS INT) + 1, 1)
        |    AS check_char,
        |  id_str || '-' || substring('0123456789ACDEFGHJKLMNPRTUVWXY',
        |            CAST((30 - luhn_sum % 30) % 30 AS INT) + 1, 1)
        |    AS full_id
        |FROM s ORDER BY client_id""".stripMargin,
    "q_person" ->
      """SELECT CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) AS BIGINT)
        |  AS person_id,
        |c_custkey AS client_id,
        |UPPER(TRIM(split_part(c_name, '#', 1))) AS given_name,
        |split_part(c_name, '#', 2) AS family_name,
        |CASE WHEN c_custkey % 3 = 0 THEN 'M'
        |     WHEN c_custkey % 3 = 1 THEN 'F' END AS gender,
        |DATE '1950-01-01' + CAST((c_custkey * 37) % 18250 AS INT)
        |  AS birthdate,
        |c_custkey % 5 = 0 AS birthdate_estimated,
        |CAST(1 AS BIGINT) AS creator,
        |false AS voided,
        |md5('person' || '|' || CAST(c_custkey AS VARCHAR) || '|' || c_name)
        |  AS uuid
        |FROM customer ORDER BY person_id""".stripMargin,
    "q_unpivot" ->
      """SELECT person_id, attr_type, value FROM (
        |  SELECT c_custkey AS person_id, 'acctbal' AS attr_type,
        |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS value
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'mktsegment', c_mktsegment FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'nation', CAST(c_nationkey AS VARCHAR)
        |  FROM customer)
        |ORDER BY person_id, attr_type""".stripMargin,
    "q_pivot" ->
      """SELECT c_custkey AS person_id,
        |CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS acctbal,
        |c_mktsegment AS mktsegment,
        |CAST(c_nationkey AS VARCHAR) AS nation
        |FROM customer ORDER BY person_id""".stripMargin)
}
