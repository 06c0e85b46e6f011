package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Sources

/** Frequent-item (heavy-hitter) detection with an EXACT, oracle-matchable
  * answer — the "what tokens dominate this corpus" profile every curation
  * run wants before filtering boilerplate.
  *
  * The naive form is a full `groupBy(token)` — a corpus-wide shuffle of
  * every token occurrence just to find ~dozens of heavy items. The
  * scale formulation is the classic two-phase sketch-then-verify:
  *
  *   1. a MERGEABLE Misra-Gries summary (k counters) runs as one
  *      map-side typed aggregate: each partition keeps at most k
  *      (token, count) slots, partials merge by count-sum + subtracting
  *      the (k+1)-th largest value (Agarwal et al., PODS 2012 — the
  *      mergeable-summaries result; public literature). Bytes shuffled:
  *      O(partitions × k), independent of corpus size.
  *   2. the THEOREM: any token with true frequency > n/(k+1) survives
  *      with a positive counter. So the k surviving keys are a complete
  *      candidate set for every token above that threshold — recall 1,
  *      proved, not sampled.
  *   3. an exact counting pass over ONLY the candidates (a broadcast-able
  *      ≤k-token filter pushed to the scan) re-establishes exact counts,
  *      and the output keeps exactly the tokens with
  *      `cnt · (k+1) > n` — an INTEGER comparison, so both engines agree
  *      bit-for-bit and the emitted set is the provably-complete one,
  *      never "whatever happened to survive the sketch".
  *
  * The result is deterministic and exact (the sketch only routes work;
  * it never appears in the answer), which is what lets a DuckDB oracle
  * hash-match it — same device as the IVF recall assertion and the
  * LSH-candidates-then-verify joins elsewhere in this engine.
  */
object Frequency {

  /** Counter budget. 64 slots ⇒ completeness threshold n/65 ≈ 1.5% of
    * corpus tokens — profile-grade. The sf corpora have ~31 distinct
    * tokens (no eviction ever fires); the spec drives eviction with a
    * 405-distinct synthetic corpus. The aggregator itself is
    * [[Sketches.MisraGries]] — the sketch tier's mergeable summary,
    * reused here as the candidate generator (its merge-order-dependent
    * COUNTS never reach the output; only its proven-complete KEY SET
    * does, which is what makes this query exact where the raw sketch is
    * not).
    */
  private[graft] val K = 64

  private def docs(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "documents")

  /** Sketch → candidates → exact verify for a token frame; exposed for
    * the spec's synthetic-corpus drive. Output: tokens with
    * `cnt · (k+1) > n` by (cnt desc, token asc), capped at `top`.
    */
  private[graft] def heavyHitters(toks: DataFrame, k: Int,
                                  top: Int): DataFrame = {
    // the sketch pass: ONE map-side aggregate job carrying both the MG
    // summary and the corpus token total (n rides the same partials, so
    // the corpus is scanned exactly twice overall: sketch, then verify)
    val mgUdaf = udaf(new Sketches.MisraGries(k),
      org.apache.spark.sql.Encoders.STRING)
    val head = toks
      .agg(mgUdaf(col(toks.columns.head)).as("mg"),
        count(lit(1)).as("n"))
      .collect()(0)
    val cand = head.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    val n = head.getLong(1)
    // the exact pass: scan-level candidate filter (≤k literals), then a
    // k-key aggregate — the only shuffle, and it carries ≤k groups
    toks.filter(col(toks.columns.head).isin(cand: _*))
      .groupBy(col(toks.columns.head).as("token"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > n)
      .orderBy(col("cnt").desc, col("token"))
      .limit(top)
  }

  private def qHeavyHitters(s: SparkSession, dir: String): DataFrame =
    heavyHitters(
      docs(s, dir).select(explode(TextOps.tokens(col("text"))).as("tok")),
      K, 10)

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_heavy_hitters" -> qHeavyHitters)

  val oracleSql: Map[String, String] = Map(
    "q_heavy_hitters" ->
      s"""WITH t AS (SELECT unnest(list_filter(string_split(text, ' '),
         |    x -> x <> '')) AS tok FROM documents),
         |n AS (SELECT count(*) AS n FROM t),
         |c AS (SELECT tok AS token, count(*) AS cnt FROM t GROUP BY tok)
         |SELECT token, cnt FROM c, n WHERE cnt * ${K + 1} > n
         |ORDER BY cnt DESC, token LIMIT 10""".stripMargin)
}
