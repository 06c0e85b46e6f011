package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.Sources

/** Fuzzy record linkage — the "is this the same patient?" capability the
  * reference's migration implies (reference `README.md:10` identifier
  * reconciliation): find identifier pairs within edit distance 1 WITHOUT an
  * all-pairs comparison.
  *
  * Blocking scheme: each 9-char identifier emits 9 blocking keys, key i =
  * the identifier with position i wildcarded. Two identifiers differing by
  * exactly one substitution share exactly the key masking that position, so
  * an equality self-join on (pos, masked) finds every substitution-distance-1
  * pair — the join key IS the block, the shuffle partitions by it, and no
  * quadratic block ever forms (candidates per key are the handful of records
  * sharing 8 of 9 chars). `levenshtein` then verifies — it also rules out
  * the identical-string case. This is the standard pass-blocking design from
  * the record-linkage literature, shaped for Spark's shuffle.
  */
object Linkage {

  /** Patient-style identifiers: the 9-digit family_name tail of c_name
    * (same derivation as the migration's name_split).
    */
  private def idents(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "customer")
      .select(col("c_custkey"),
        split(col("c_name"), "#").getItem(1).as("ident"))

  /** One-shuffle formulation: group the masked rows by blocking key and
    * expand ordered pairs INSIDE each (tiny) group with array HOFs, instead
    * of a self-join — which would evaluate the masked rows twice, shuffle
    * both copies, and need a distinct exchange. The wildcard position is
    * implied by the '#' placement, so the mask string alone is the block
    * key. A substitution-distance-1 pair shares exactly one mask ⇒ after
    * the levenshtein filter no duplicates exist and no `distinct` is
    * needed (identical idents share all 9 masks but fail distance = 1).
    * Per-group arrays are sorted on the unique c_custkey, so pair order
    * and output are deterministic.
    */
  /** Per-mask-group size cap. The in-group pair expansion below collects
    * each blocking group into one array, whose size is data-dependent: a
    * degenerate identifier distribution (thousands of ids sharing 8 of 9
    * chars) would bloat a single group into an O(g²) row and memory spike.
    * Like [[Dedup.MaxCcRounds]], a group past the cap is a data bug worth
    * failing LOUDLY on (the fix at that point is a pair-join formulation
    * over the offending masks), not silently grinding through.
    */
  private[graft] val MaxMaskGroup = 1024

  /** The blocking + in-group pair expansion over an arbitrary
    * (c_custkey, ident) frame — `private[graft]` so the adversarial spec
    * can drive it with a degenerate identifier distribution.
    */
  private[graft] def linkPairs(ids: DataFrame): DataFrame = {
    val masked = ids
      .select(col("c_custkey"), col("ident"),
        explode(sequence(lit(1), lit(9))).as("pos"))
      .select(col("c_custkey"), col("ident"),
        concat(
          col("ident").substr(lit(1), col("pos") - 1),
          lit("#"),
          col("ident").substr(col("pos") + 1, lit(9))).as("mkey"))
    masked
      .groupBy("mkey")
      .agg(sort_array(collect_list(
        struct(col("c_custkey"), col("ident")))).as("g"))
      .filter(size(col("g")) >= 2)
      // assert_true returns NULL when the guard holds and throws otherwise,
      // so the `when` wrapper is an identity on healthy data — the cap
      // rides the existing plan with no extra pass
      .withColumn("g",
        when(assert_true(size(col("g")) <= MaxMaskGroup,
          concat(lit(s"linkage mask group exceeds $MaxMaskGroup for key "),
            col("mkey"))).isNull, col("g")))
      .select(explode(flatten(transform(col("g"), (x, i) =>
        transform(slice(col("g"), i + 2, size(col("g"))), y =>
          struct(x.getField("c_custkey").as("cust_a"),
            y.getField("c_custkey").as("cust_b"),
            x.getField("ident").as("ident_a"),
            y.getField("ident").as("ident_b")))))).as("p"))
      .select(col("p.cust_a"), col("p.cust_b"),
        col("p.ident_a"), col("p.ident_b"))
      .filter(levenshtein(col("ident_a"), col("ident_b")) === 1)
      .withColumn("distance", lit(1L))
      .orderBy("cust_a", "cust_b")
  }

  private def qLinkNames(s: SparkSession, dir: String): DataFrame =
    linkPairs(idents(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_link_names" -> qLinkNames)

  val oracleSql: Map[String, String] = Map(
    "q_link_names" ->
      """WITH ids AS (SELECT c_custkey,
        |  split_part(c_name, '#', 2) AS ident FROM customer),
        |masked AS (SELECT c_custkey, ident, pos,
        |  substring(ident, 1, pos - 1) || '#' || substring(ident, pos + 1)
        |    AS mkey
        |  FROM ids, (SELECT unnest(range(1, 10)) AS pos)),
        |cand AS (SELECT DISTINCT
        |  a.c_custkey AS cust_a, b.c_custkey AS cust_b,
        |  a.ident AS ident_a, b.ident AS ident_b
        |  FROM masked a JOIN masked b
        |  ON a.pos = b.pos AND a.mkey = b.mkey
        |  AND a.c_custkey < b.c_custkey)
        |SELECT cust_a, cust_b, ident_a, ident_b, CAST(1 AS BIGINT) AS distance
        |FROM cand WHERE levenshtein(ident_a, ident_b) = 1
        |ORDER BY cust_a, cust_b""".stripMargin)
}
