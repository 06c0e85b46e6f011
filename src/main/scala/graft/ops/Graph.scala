package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Sources

/** Iterative graph compute beyond connected components: PageRank, the
  * canonical "many rounds over a big edge list" workload.
  *
  * Determinism design: ranks live in INTEGER units of 1e-12 (SCALE), and
  * every step is integer arithmetic — `contribution = rank div outdeg`,
  * `rank' = base + (85 * Σ contributions) div 100`. Integer sums are
  * associative-commutative EXACTLY, so the result is independent of
  * partitioning and merge order (a double formulation would not be: its
  * additions round differently per order), and the DuckDB oracle replays
  * the identical 10 iterations bit-for-bit. The deliberate trade: this is
  * fixed-point PageRank with truncating division — a variant, chosen so
  * correctness is *provable* across engines; the float form differs from
  * it only below 1e-10 relative.
  *
  * Scale shape per iteration: one shuffle (contributions grouped by dst) +
  * a broadcast-joinable node frame; ranks are checkpointed each round so
  * the plan stays O(1) like the CC loop ([[Dedup.propagateMinLabels]]).
  * The graph is derived from the customer table (nodes = custkey % 997,
  * two arithmetic out-edges per node) — testdata-derived, never synthetic
  * row generation.
  */
object Graph {

  private val N = 997L
  private val Scale = 1000000000000L // 1e12
  private val Iters = 10

  /** Distinct directed edges (src, dst): two deterministic out-edges per
    * live node.
    */
  private[graft] def edges(s: SparkSession, dir: String): DataFrame = {
    val node = (col("c_custkey") % N).as("src")
    Sources.table(s, dir, "customer")
      .select(node)
      .distinct()
      .select(col("src"), explode(array(
        (col("src") * 7 + 1) % N,
        (col("src") * 13 + 3) % N)).as("dst"))
      .distinct()
  }

  private def checkpoint(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()

  /** 10 fixed iterations of integer PageRank over the derived graph. */
  private def qPagerank(s: SparkSession, dir: String): DataFrame = {
    val e = edges(s, dir)
    // loop-invariant adjacency with out-degrees attached ONCE — one join
    // per iteration instead of two, and no shared-lineage ambiguity
    // between the raw edges and their own degree aggregate inside the loop
    val eo = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .cache()
    // node universe = sources ∪ destinations, materialized once (every
    // iteration's left join re-reads it)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .cache()
    // base uses the fixed modulus N, not the data-dependent live-node
    // count — it only has to be the SAME constant in both engines
    val base = (15L * (Scale / N)) / 100L
    var pr = checkpoint(nodes.select(col("node"), lit(Scale / N).as("v")))
    (1 to Iters).foreach { i =>
      val contrib = eo.join(pr.withColumnRenamed("node", "src"), "src")
        // `div` (integer division), never `/` (Spark's `/` on longs is
        // DOUBLE division — it would silently break the determinism story)
        .select(col("dst").as("to"), expr("v div outdeg").as("c"))
        .groupBy("to")
        .agg(sum(col("c")).as("in_sum"))
      val next = nodes.join(contrib, col("node") === col("to"), "left")
        .select(col("node"),
          expr(s"$base + (85 * coalesce(in_sum, 0)) div 100").as("v"))
      // checkpoint every SECOND round (and the last): plan depth stays ≤2
      // iterations while halving the eager materializations — lineage
      // truncation is what matters, per-round is overkill
      pr = if (i % 2 == 0 || i == Iters) checkpoint(next) else next
      ()
    }
    val out = pr.orderBy("node")
    eo.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> qPagerank)

  /** The identical 10 iterations unrolled as CTEs (recursive CTEs cannot
    * aggregate in the recursive member, so fixed iteration count = plain
    * unrolled chain, same device as the 2-step Lloyd oracle).
    */
  private def iterSql(prev: String, cur: String): String =
    s"""$cur AS (SELECT n.node,
       |  $BaseSql + (85 * COALESCE(c.in_sum, 0)) // 100 AS v
       |  FROM nodes n LEFT JOIN (
       |    SELECT e.dst AS node, sum(p.v // d.outdeg) AS in_sum
       |    FROM $prev p JOIN outdeg d ON p.node = d.src
       |    JOIN edges e ON p.node = e.src
       |    GROUP BY e.dst) c ON n.node = c.node)""".stripMargin

  private val BaseSql = s"(15 * ($Scale // $N)) // 100"

  val oracleSql: Map[String, String] = Map(
    "q_pagerank" -> {
      val chain = (1 to Iters)
        .map(i => iterSql(s"pr${i - 1}", s"pr$i")).mkString(",\n")
      s"""WITH srcs AS (SELECT DISTINCT c_custkey % $N AS src FROM customer),
         |edges AS (SELECT DISTINCT src, dst FROM (
         |  SELECT src, (src * 7 + 1) % $N AS dst FROM srcs
         |  UNION ALL
         |  SELECT src, (src * 13 + 3) % $N FROM srcs)),
         |outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
         |nodes AS (SELECT src AS node FROM edges
         |  UNION SELECT dst FROM edges),
         |pr0 AS (SELECT node, $Scale // $N AS v FROM nodes),
         |$chain
         |SELECT node, CAST(v AS BIGINT) AS v FROM pr$Iters
         |ORDER BY node""".stripMargin
    })
}
