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
  *     total row count and MAXIMUM count of everything outside the
  *     top-K (`othersTotal`/`othersMax`);
  *   - SOUND merging across entries: a value's table-wide count lies
  *     in [Σ listed counts, Σ listed counts + Σ_unlisted othersMax] —
  *     exact lower bound because per-entry counts are exact, sound
  *     upper bound because an unlisted value cannot beat that entry's
  *     (K+1)-th count;
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

  /** Per-column exact top-K over `df` — ONE aggregate job: per-column
    * legs union into (col, value) rows, one count shuffle, a per-column
    * rank, and a conditional re-aggregate that carries the ≤K listed
    * pairs and the others account in the same pass. Driver receives
    * ≤ cols rows of ≤ K pairs each.
    */
  def counts(df: DataFrame, cols: Seq[String]): Map[String, Freq] = {
    if (cols.isEmpty) return Map.empty
    val legs = cols.map(c => df.filter(col(c).isNotNull)
      .select(lit(c).as("__c"), col(c).cast("string").as("__v")))
    val ranked = legs.reduce(_ unionAll _)
      .groupBy("__c", "__v").agg(count(lit(1)).as("__n"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__c").orderBy(desc("__n"), asc("__v"))))
    val rows = ranked.groupBy("__c").agg(
      sort_array(collect_list(when(col("__rn") <= K,
        struct(col("__rn"), col("__v"), col("__n"))))).as("__top"),
      coalesce(sum(when(col("__rn") > K, col("__n"))), lit(0L))
        .as("__ot"),
      coalesce(max(when(col("__rn") > K, col("__n"))), lit(0L))
        .as("__om"))
      .collect()
    rows.map { r =>
      val top = r.getSeq[Row](1)
        .map(p => (p.getString(1), p.getLong(2)))
      r.getString(0) -> Freq(top, r.getLong(2), r.getLong(3))
    }.toMap
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
    val ranked = legs.reduce(_ unionAll _)
      .groupBy("__dir", "__c", "__v").agg(count(lit(1)).as("__n"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__dir", "__c")
          .orderBy(desc("__n"), asc("__v"))))
    val rows = ranked.groupBy("__dir", "__c").agg(
      sort_array(collect_list(when(col("__rn") <= K,
        struct(col("__rn"), col("__v"), col("__n"))))).as("__top"),
      coalesce(sum(when(col("__rn") > K, col("__n"))), lit(0L))
        .as("__ot"),
      coalesce(max(when(col("__rn") > K, col("__n"))), lit(0L))
        .as("__om"))
      .collect()
    rows.map { r =>
      val top = r.getSeq[Row](2)
        .map(p => (p.getString(1), p.getLong(2)))
      (r.getString(0), r.getString(1)) ->
        Freq(top, r.getLong(3), r.getLong(4))
    }.toMap
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
