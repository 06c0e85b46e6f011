package graft.io

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-(entry, STRING column) TOP-K FREQUENCY summaries for the table
  * format's metadata layer (r20 — the r19 VERDICT #4): the skewed
  * string predicate (`lang = 'en'`, a hot domain, a boilerplate tag)
  * is the one shape NDV uniformity gets catastrophically wrong — a
  * 95 %-of-corpus value estimates at rows/ndv, thousands of times off
  * — and Spark's numeric equi-height [[QuantileHist]] cannot carry a
  * string domain. The summary is the classic heavy-hitters shape
  * (Misra-Gries / space-saving family, mergeable-summaries
  * literature), but collected EXACTLY per entry, which this format can
  * afford because a summary covers ONE commit's dir, not the table:
  *
  *   - per entry and column: the EXACT top-K (value, count) pairs
  *     (count-desc, value-asc tiebreak — deterministic), plus the
  *     total count outside the top-K and a sound per-value CAP on any
  *     unlisted value (`othersTotal`/`othersMax` — the K-th listed
  *     count: no unlisted value can beat the value that kept it out);
  *   - SOUND merging across entries: a value's table-wide count lies
  *     in [Σ listed counts, Σ listed counts + Σ_unlisted othersMax] —
  *     exact lower bound because per-entry counts are exact, sound
  *     upper bound by the cap above;
  *   - the same sound-first coverage discipline as the NDV/histogram
  *     sketches: a rewrite's fresh entry re-counts whatever coverage
  *     the standing entries all carry ([[TableFormat]]'s resketch
  *     upkeep), and any gap makes every consumer decline.
  *
  * Summaries ride the manifest's `hist` map under the `mg:` prefix
  * (string columns never carry a numeric histogram, so the slot is
  * free); [[GraftFrequencyHints]] consumes them to steer broadcast
  * decisions that NDV uniformity would get wrong.
  */
object FreqSketch {

  /** Slots per (entry, column). 32 values bound the summary to ~a KB
    * per entry while covering every value above ~3 % of the entry —
    * the skew range where the uniformity error is large enough to
    * flip a plan decision.
    */
  val K = 32

  /** Longest value a summary may carry. Frequency summaries target
    * low-cardinality CATEGORICAL strings (language tags, domains,
    * status enums); a column whose top values run longer (URLs, text)
    * would bloat every manifest line with up to K full values — the
    * landing paths DECLINE the summary for such a column (a gap, so
    * consumers stand down) rather than truncate, because a truncated
    * value can no longer answer an exact-equality lookup. The zone
    * maps' truncated-string decline is the same discipline.
    */
  val MaxValueLen = 64

  /** Does every listed value fit the manifest budget? */
  def withinCap(f: Freq): Boolean =
    f.top.forall(_._1.length <= MaxValueLen)

  private[graft] val Prefix = "mg:"

  /** One column's summary for one entry. */
  case class Freq(top: Seq[(String, Long)], othersTotal: Long,
                  othersMax: Long) {
    def total: Long = top.map(_._2).sum + othersTotal
  }

  def isFreq(encoded: String): Boolean = encoded.startsWith(Prefix)

  /** The STRING-typed subset of `cols` over `df` — the domains the
    * numeric histogram cannot carry.
    */
  def supported(df: DataFrame, cols: Seq[String]): Seq[String] =
    cols.filter(c => df.schema.find(_.name == c)
      .exists(_.dataType == org.apache.spark.sql.types.StringType))

  /** Shared SKEW-FREE top-K over an exact (keys…, __v, __n) count
    * frame. A single rank window partitioned by the key alone would
    * funnel EVERY distinct value of a column through one task — the
    * classic top-k skew wall at a high-NDV string column (URLs at
    * 100 TB). Instead:
    *
    *   1. a LOCAL top-K per (key, shuffle partition) — the window key
    *     includes `spark_partition_id()`, so parallelism holds and the
    *     survivors are a proven SUPERSET of the global top-K (a global
    *     top-K row beaten by K same-key rows in its own partition
    *     would be beaten by them globally too);
    *   2. the GLOBAL top-K over those ≤ K·partitions candidates — a
    *     bounded frame;
    *   3. per-key totals (Σ counts, distinct count) ride the count
    *     frame as an ordinary map-side-combined aggregate.
    *
    * The others account derives soundly: `othersTotal` = Σ − Σ listed;
    * `othersMax` = the K-th (smallest listed) count when anything is
    * unlisted — no unlisted value can beat the value that kept it out
    * of the top-K. (Slightly looser than the true (K+1)-th count,
    * which the pruned candidates cannot witness; sound either way.)
    */
  private def topKByKey(counted: DataFrame, keyCols: Seq[String])
      : Seq[(Seq[String], Freq)] = {
    val keyed = keyCols.map(col)
    val cached = counted.persist()
    try {
      val local = cached
        .withColumn("__pid", spark_partition_id())
        .withColumn("__rn", row_number().over(
          Window.partitionBy(keyed :+ col("__pid"): _*)
            .orderBy(desc("__n"), asc("__v"))))
        .filter(col("__rn") <= K).drop("__pid", "__rn")
      val top = local
        .withColumn("__rn", row_number().over(
          Window.partitionBy(keyed: _*).orderBy(desc("__n"), asc("__v"))))
        .filter(col("__rn") <= K)
        .groupBy(keyed: _*)
        .agg(sort_array(collect_list(
          struct(col("__rn"), col("__v"), col("__n")))).as("__top"))
      val tot = cached.groupBy(keyed: _*)
        .agg(sum(col("__n")).as("__tot"), count(lit(1)).as("__ndv"))
      top.join(tot, keyCols).collect().toSeq.map { r =>
        val key = keyCols.indices.map(r.getString)
        val top = r.getSeq[Row](keyCols.size)
          .map(p => (p.getString(1), p.getLong(2)))
        val total = r.getLong(keyCols.size + 1)
        val ndv = r.getLong(keyCols.size + 2)
        val listed = top.map(_._2).sum
        val othersMax = if (ndv > top.size) top.map(_._2).min else 0L
        (key, Freq(top, total - listed, othersMax))
      }
    } finally { cached.unpersist(); () }
  }

  /** Per-column exact top-K over `df`: per-column legs union into
    * (col, value) rows, one exact count shuffle, then the skew-free
    * two-stage rank ([[topKByKey]]). Driver receives ≤ cols rows of
    * ≤ K pairs each.
    */
  def counts(df: DataFrame, cols: Seq[String]): Map[String, Freq] = {
    if (cols.isEmpty) return Map.empty
    val legs = cols.map(c => df.filter(col(c).isNotNull)
      .select(lit(c).as("__c"), col(c).cast("string").as("__v")))
    val counted = legs.reduce(_ unionAll _)
      .groupBy("__c", "__v").agg(count(lit(1)).as("__n"))
    topKByKey(counted, Seq("__c"))
      .map { case (key, f) => key.head -> f }.toMap
  }

  /** Per-(dir, column) summaries over a multi-dir scan carrying a
    * `__dir` column — the ANALYZE retrofit form.
    */
  def countsByDir(tagged: DataFrame, cols: Seq[String])
      : Map[(String, String), Freq] = {
    if (cols.isEmpty) return Map.empty
    val legs = cols.map(c => tagged.filter(col(c).isNotNull)
      .select(col("__dir"), lit(c).as("__c"),
        col(c).cast("string").as("__v")))
    val counted = legs.reduce(_ unionAll _)
      .groupBy("__dir", "__c", "__v").agg(count(lit(1)).as("__n"))
    topKByKey(counted, Seq("__dir", "__c"))
      .map { case (key, f) => (key.head, key(1)) -> f }.toMap
  }

  private def enc(s: String): String =
    URLEncoder.encode(s, StandardCharsets.UTF_8.name)

  private def dec(s: String): String =
    URLDecoder.decode(s, StandardCharsets.UTF_8.name)

  /** Manifest encoding: `mg:<othersTotal>:<othersMax>;v~c,v~c,…` with
    * URL-encoded values (counts descending, value-asc ties — the
    * collection order).
    */
  def encode(f: Freq): String =
    s"$Prefix${f.othersTotal}:${f.othersMax};" +
      f.top.map { case (v, n) => s"${enc(v)}~$n" }.mkString(",")

  def decode(s: String): Freq = {
    require(isFreq(s), s"not a frequency summary: $s")
    val body = s.substring(Prefix.length)
    val semi = body.indexOf(';')
    val head = body.substring(0, semi).split(":")
    val top = body.substring(semi + 1).split(",").toSeq
      .filter(_.nonEmpty).map { kv =>
        val t = kv.lastIndexOf('~')
        (dec(kv.substring(0, t)), kv.substring(t + 1).toLong)
      }
    Freq(top, head(0).toLong, head(1).toLong)
  }

  /** Table-wide count bounds of `v` across entry summaries:
    * [Σ listed, Σ listed + Σ_unlisted othersMax]. Exact when every
    * entry lists the value (or has nothing outside its top-K).
    */
  def estimate(fs: Seq[Freq], v: String): (Long, Long) =
    fs.foldLeft((0L, 0L)) { case ((lo, hi), f) =>
      f.top.find(_._1 == v) match {
        case Some((_, n)) => (lo + n, hi + n)
        case None => (lo, hi + f.othersMax)
      }
    }
}
