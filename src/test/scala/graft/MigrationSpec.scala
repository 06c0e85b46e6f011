package graft

import org.apache.spark.sql.functions._

import graft.etl.Migration

/** Unit specs for the reference-surface transforms (SURVEY.md §5.2 layer 2):
  * check-digit arithmetic, identifier fallback branches, deterministic ids.
  */
class MigrationSpec extends TestSpark {

  test("luhn mod-30 check digit: reference values and structure") {
    // independent recomputation for a couple of ids
    // id "0": value 0, rightmost doubled: 0 -> sum 0 -> check (30-0)%30=0 -> '0'
    assert(Migration.luhnMod30("0") === "0")
    // id "1": doubled -> 2, check = 30-2 = 28 -> chars(28) = 'X'
    assert(Migration.luhnMod30("1") === "X")
    // all check chars come from the mod-30 alphabet
    (0 until 200).foreach { i =>
      val c = Migration.luhnMod30(i.toString)
      assert(c.length === 1 && Migration.Mod30Chars.contains(c))
    }
  }

  test("codegen'd Luhn expression agrees with the UDF value-for-value") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // mixed shapes: numeric, prefixed, lower-case (kernel upper-cases)
    val ids = ((0L until 300L).map(_.toString) ++
      (0L until 100L).map(i => s"GEN-$i") ++
      Seq("", "acdefghj", "x9y")).toDF("id")
    val out = ids.select(
      graft.functions.LuhnExprs.luhnMod30(col("id")).as("e"),
      Migration.luhnMod30Udf(col("id")).as("u")).collect()
    out.foreach(r => assert(r.getString(0) === r.getString(1)))
    // null in → null out (the UDF form NPEs on null — the expression's
    // null-intolerant contract is strictly safer; production paths never
    // feed it null, but a dirty roster must not crash the stage)
    val nulls = Seq(Option.empty[String]).toDF("id").select(
      graft.functions.LuhnExprs.luhnMod30(col("id")).as("e")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("luhn mod-30 rejects single-digit mutations") {
    // property: changing one digit changes the check digit (Luhn guarantee)
    (0 until 100).foreach { i =>
      val id = i.toString
      val check = Migration.luhnMod30(id)
      id.indices.foreach { pos =>
        val orig = id.charAt(pos) - '0'
        val mutated = id.updated(pos, ('0' + ((orig + 3) % 10)).toChar)
        if (mutated != id && mutated.head != '0') {
          assert(Migration.luhnMod30(mutated) != check ||
            mutated.toLong == id.toLong)
        }
      }
    }
  }

  test("identifier fallback covers all four branches") {
    val q = graft.SparkEntry.queries("q_ident_fallback")(spark, Sf)
    val byType = q.groupBy("identifier_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // custkeys 0..149: %3==0 -> 50 national; else %2==0 -> 50 BC; rest gen
    assert(byType("national_id") === 50)
    assert(byType("birth_certificate") === 50)
    assert(byType("generated") === 50)
    // priority: a client with both keeps national_id (custkey 6)
    val both = q.filter(col("client_id") === 6).collect().head
    assert(both.getAs[String]("identifier_type") === "national_id")
  }

  test("deterministic uuid is stable and content-derived") {
    val a = graft.SparkEntry.queries("q_det_uuid")(spark, Sf).collect()
    val b = graft.SparkEntry.queries("q_det_uuid")(spark, Sf).collect()
    assert(a.sameElements(b)) // idempotent re-run (unlike reference uuid())
    assert(a.map(_.getString(1)).distinct.length === a.length)
  }

  test("prod uuid flag mints RFC-4122 v4 uuids with identical keys") {
    val det = graft.SparkEntry.queries("q_person")(spark, Sf).collect()
    spark.conf.set(Migration.ProdUuidFlag, "true")
    try {
      val prod = graft.SparkEntry.queries("q_person")(spark, Sf).collect()
      assert(prod.length === det.length)
      // every column except uuid matches the deterministic run row-for-row
      // (rows are totally ordered by person_id in both)
      det.zip(prod).foreach { case (d, p) =>
        (0 until d.length - 1).foreach(i => assert(d.get(i) === p.get(i)))
      }
      // uuid() output is RFC-4122 v4 shaped and unique per row
      val v4 = "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$".r
      val uuids = prod.map(_.getAs[String]("uuid"))
      uuids.foreach(u => assert(v4.matches(u), s"not RFC-4122 v4: $u"))
      assert(uuids.distinct.length === uuids.length)
      // and genuinely fresh per run, unlike the deterministic form
      val detUuids = det.map(_.getAs[String]("uuid")).toSet
      assert(uuids.toSet.intersect(detUuids).isEmpty)
    } finally spark.conf.unset(Migration.ProdUuidFlag)
  }

  test("surrogate keys are dense and unique") {
    val ids = graft.SparkEntry.queries("q_surrogate_key")(spark, Sf)
      .select("person_id").collect().map(_.getLong(0)).sorted
    assert(ids.head === 1L)
    assert(ids.last === ids.length.toLong)
    assert(ids.distinct.length === ids.length)
  }

  test("flagship q_person plan has no partition-unbounded window") {
    // the showcase query mints person_id via surrogateKeysScaled: every
    // window must be keyed by the __pid range-partition id — a regression
    // back to row_number().over(Window.orderBy(...)) funnels the whole
    // table through one task at 100 TB (round-4 VERDICT #1)
    val plan = graft.SparkEntry.queries("q_person")(spark, Sf)
      .queryExecution.executedPlan.toString
    assertOnlyPidWindows(plan, "q_person")
  }

  test("migrateAll bundle is FK-consistent across all seven tables") {
    val tables = Migration.migrateAll(spark, Sf).toMap
    def ids(t: String, c: String): Set[Long] =
      tables(t).select(c).collect().map(_.getLong(0)).toSet

    val persons = ids("person", "person_id")
    val n = persons.size
    // dense surrogate keys 1..n
    assert(persons === (1L to n.toLong).toSet)
    // 1:1 tables carry exactly the person keys
    assert(ids("person_name", "person_id") === persons)
    assert(ids("person_address", "person_id") === persons)
    assert(ids("patient", "patient_id") === persons)
    assert(ids("patient_identifier", "patient_id") === persons)
    assert(ids("dreams_client_patient_mapping", "patient_id") === persons)
    // attributes: 3 per person, all FKs valid
    val attr = tables("person_attribute")
    assert(attr.count() === 3L * n)
    assert(ids("person_attribute", "person_id") === persons)
    // the mapping joins back to person recovering the original client_id
    val joined = tables("dreams_client_patient_mapping").as("m")
      .join(tables("person").as("p"),
        col("m.patient_id") === col("p.person_id"))
      .filter(col("m.client_id") =!= col("p.client_id"))
    assert(joined.count() === 0)
    // row counts: every table has exactly one row per person (attrs 3)
    Seq("person", "person_name", "person_address", "patient",
      "patient_identifier", "dreams_client_patient_mapping").foreach(t =>
      assert(tables(t).count() === n.toLong, s"count mismatch in $t"))
  }

  test("pivot(unpivot) round-trips the wide attributes") {
    val wide = graft.SparkEntry.queries("q_pivot")(spark, Sf)
    val src = graft.io.Sources.table(spark, Sf, "customer")
    assert(wide.count() === src.count())
    val row = wide.filter(col("person_id") === 0).collect().head
    assert(row.getAs[String]("mktsegment") === "FURNITURE")
    assert(row.getAs[String]("acctbal") === "2095.23")
  }
}
