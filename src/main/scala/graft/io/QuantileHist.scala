package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.LongLeadingZeros

/** Per-column VALUE-DISTRIBUTION sketches for the table format's
  * metadata layer (r19 — the r18 VERDICT's #5 gap): a fixed LOG-SCALED
  * counting histogram over the long domain — sign × octave × 8
  * sub-bins (the public HdrHistogram bucketing idea) — so a skewed
  * predicate's selectivity estimates off the real distribution instead
  * of min/max uniformity. The discipline mirrors [[NdvSketch]]:
  *
  *   - DETERMINISTIC by construction: the bin of a value is a pure
  *     function of the value (no sampling, no seed at all), so the same
  *     data always yields the same counts — plan pins and reproducible
  *     stats hold;
  *   - EXACTLY mergeable: the union's histogram is the bin-wise SUM of
  *     the parts' histograms (counts add — not approximately), so
  *     per-ENTRY sketches compose into the head snapshot's distribution
  *     with zero data I/O however entries come and go;
  *   - sound-first: a rewrite's fresh entry carries no histogram and
  *     every consumer declines on the gap until the next ANALYZE — the
  *     zone-map contract.
  *
  * Resolution: 8 sub-bins per octave ⇒ every bin spans at most 12.5 %
  * of its value's magnitude — coarse within a bin (consumers assume
  * value-uniformity inside one), sharp across magnitudes, which is
  * where real skew (a hot key at 0, a long tail of ids) lives. Bins are
  * SPARSE in the manifest (`idx:count` pairs — a dir covering few
  * magnitudes costs a few tens of bytes). Integral and date (epoch-day)
  * columns only — the same comparison domains the zone maps prune in.
  *
  * At stats time the merged counts convert to Spark's equi-height
  * [[org.apache.spark.sql.catalyst.plans.logical.Histogram]] (bins
  * split/coalesced to equal row mass, value-uniform inside a source
  * bin), feeding FilterEstimation's histogram path under CBO.
  */
object QuantileHist {

  /** Bin index of a long value: 0 for 0; positive values map to
    * `1 + octave*8 + sub` (octave = floor(log2 v) ∈ [0, 62], sub = the
    * 3 bits after the leading bit, scaled); negatives mirror to the
    * negated index of |v| (Long.MinValue clamps to the top negative
    * octave). Pure, total, deterministic.
    */
  def binOf(v: Long): Int =
    if (v == 0L) 0
    else if (v > 0L) posBin(v)
    else if (v == Long.MinValue) -posBin(Long.MaxValue)
    else -posBin(-v)

  private def posBin(v: Long): Int = {
    val o = 63 - java.lang.Long.numberOfLeadingZeros(v)
    val shift = math.max(o - 3, 0)
    val sub = ((v - (1L << o)) >>> shift).toInt
    1 + o * 8 + sub
  }

  /** Inclusive [lo, hi] value range of a bin index (inverse of
    * [[binOf]] up to bin granularity).
    */
  def binRange(idx: Int): (Long, Long) = {
    if (idx == 0) return (0L, 0L)
    val neg = idx < 0
    val i = math.abs(idx) - 1
    val o = i / 8
    val sub = i % 8
    val shift = math.max(o - 3, 0)
    val lo = (1L << o) + (sub.toLong << shift)
    val hi = lo + (1L << shift) - 1
    if (neg) (-hi, -lo) else (lo, hi)
  }

  /** The [[binOf]] arithmetic as a native Column over a LONG column —
    * whole-stage-codegen friendly (bitwise ops + the
    * [[LongLeadingZeros]] expression [[NdvSketch]] already uses), no
    * UDF. NULLs yield NULL (dropped by the collector).
    */
  private def binCol(v: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{ShiftLeft, ShiftRightUnsigned}
    // the sql.functions shift forms take a literal bit count; the
    // Catalyst expressions accept a column — built through the bridge
    def shl(a: Column, bits: Column): Column = ColumnBridge.column(
      ShiftLeft(ColumnBridge.expression(a),
        ColumnBridge.expression(bits.cast("int"))))
    def shr(a: Column, bits: Column): Column = ColumnBridge.column(
      ShiftRightUnsigned(ColumnBridge.expression(a),
        ColumnBridge.expression(bits.cast("int"))))
    def pos(x: Column): Column = {
      val o = lit(63) - ColumnBridge.column(
        LongLeadingZeros(ColumnBridge.expression(x)))
      val shift = greatest(o - 3, lit(0))
      val sub = shr(x - shl(lit(1L), o), shift)
      (lit(1) + o * 8 + sub).cast("int")
    }
    when(v === 0L, lit(0))
      .when(v > 0L, pos(v))
      .when(v === Long.MinValue, -pos(lit(Long.MaxValue)))
      .otherwise(-pos(-v))
  }

  /** Comparable-domain long form of a column for binning: integral
    * columns verbatim, dates as epoch days; anything else None (the
    * caller skips the column — same domains as the zone maps).
    */
  private[io] def longForm(df: DataFrame, c: String): Option[Column] = {
    import org.apache.spark.sql.types._
    df.schema.find(_.name == c).map(_.dataType) match {
      case Some(LongType | IntegerType | ShortType | ByteType) =>
        Some(col(c).cast("long"))
      case Some(DateType) =>
        Some(datediff(col(c), lit("1970-01-01").cast(DateType))
          .cast("long"))
      case _ => None
    }
  }

  /** The subset of `cols` whose type the histogram supports over `df`
    * — an all-null dir of a SUPPORTED column legitimately records an
    * EMPTY histogram (zero value rows), never a gap that would gate the
    * fold forever; unsupported types stay gaps by design.
    */
  def supported(df: DataFrame, cols: Seq[String]): Seq[String] =
    cols.filter(c => longForm(df, c).isDefined)

  /** Per-column sparse bin counts over `df` — ONE job, the
    * [[NdvSketch.sketches]] shape: column-pruned per-column legs union,
    * map-side-combined counts, ≤ cols · ~1000 tiny rows to the driver.
    * Unsupported-typed columns are silently absent from the result.
    */
  def counts(df: DataFrame, cols: Seq[String])
      : Map[String, Map[Int, Long]] = {
    require(cols.nonEmpty, "histogram needs at least one column")
    val parts = cols.flatMap { c =>
      longForm(df, c).map(v =>
        df.filter(col(c).isNotNull)
          .select(lit(c).as("__c"), binCol(v).as("__b")))
    }
    if (parts.isEmpty) return Map.empty
    val rows = parts.reduce(_ unionAll _)
      .groupBy("__c", "__b").agg(count(lit(1)).as("__n"))
      .collect() // bounded: ≤ cols · ~1000 rows
    rows.groupBy(_.getString(0)).map { case (c, rs) =>
      c -> rs.map(r => r.getInt(1) -> r.getLong(2)).toMap
    }
  }

  /** Per-(dir, column) sparse bin counts over a multi-dir scan carrying
    * a `__dir` column — the [[TableFormat.analyze]] retrofit form,
    * packed to one row per (dir, column) before the driver collect.
    */
  def countsByDir(tagged: DataFrame, cols: Seq[String])
      : Map[(String, String), Map[Int, Long]] = {
    require(cols.nonEmpty, "histogram needs at least one column")
    val parts = cols.flatMap { c =>
      longForm(tagged, c).map(v =>
        tagged.filter(col(c).isNotNull)
          .select(col("__dir"), lit(c).as("__c"), binCol(v).as("__b")))
    }
    if (parts.isEmpty) return Map.empty
    val rows = parts.reduce(_ unionAll _)
      .groupBy("__dir", "__c", "__b").agg(count(lit(1)).as("__n"))
      .groupBy("__dir", "__c")
      .agg(collect_list(struct(col("__b"), col("__n"))).as("__bins"))
      .collect()
    rows.map { row =>
      val m = row.getSeq[org.apache.spark.sql.Row](2)
        .map(p => p.getInt(0) -> p.getLong(1)).toMap
      (row.getString(0), row.getString(1)) -> m
    }.toMap
  }

  /** Bin-wise SUM — the union's histogram, exactly. */
  def merge(a: Map[Int, Long], b: Map[Int, Long]): Map[Int, Long] =
    (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap

  /** Sparse manifest encoding: `idx:count` pairs, index-sorted. */
  def encode(m: Map[Int, Long]): String =
    m.toSeq.sortBy(_._1).map { case (i, n) => s"$i:$n" }.mkString(",")

  def decode(s: String): Map[Int, Long] =
    s.split(",").filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf(':')
      kv.substring(0, i).toInt -> kv.substring(i + 1).toLong
    }.toMap

  /** Convert merged log-bin counts into Spark's EQUI-HEIGHT histogram
    * (up to `maxBins` bins of equal row mass): walk the source bins in
    * value order, splitting a source bin's mass value-uniformly when a
    * boundary falls inside it. The result feeds FilterEstimation's
    * histogram-based selectivity under CBO. `ndv` (when known) prorates
    * each equi-height bin's distinct count by row mass; otherwise the
    * bin's value span bounds it.
    */
  def toEquiHeight(counts: Map[Int, Long], maxBins: Int = 64,
      ndv: Option[Long] = None)
      : Option[org.apache.spark.sql.catalyst.plans.logical.Histogram] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Histogram, HistogramBin}
    if (counts.isEmpty) return None
    val total = counts.values.sum
    if (total <= 0) return None
    val src = counts.toSeq.sortBy { case (i, _) => binRange(i)._1 }
      .map { case (i, n) => val (lo, hi) = binRange(i); (lo, hi, n) }
    val nBins = math.min(maxBins, math.max(1, src.size))
    val height = total.toDouble / nBins
    val bins = Array.newBuilder[HistogramBin]
    var acc = 0.0
    var binLo = src.head._1.toDouble
    var binRows = 0.0
    src.foreach { case (lo, hi, n) =>
      var remaining = n.toDouble
      var cursor = lo.toDouble
      val width = (hi - lo + 1).toDouble
      while (remaining > 0) {
        val need = height - acc
        if (remaining <= need + 1e-9) {
          acc += remaining
          binRows += remaining
          cursor = hi.toDouble
          remaining = 0
        } else {
          // boundary inside this source bin: split value-uniformly
          val frac = need / n.toDouble
          val splitAt = cursor + frac * width
          binRows += need
          val ndvB = ndv.map(d => math.max(1L,
            math.rint(d.toDouble * binRows / total).toLong))
            .getOrElse(math.max(1L, binRows.toLong))
          bins += HistogramBin(binLo, splitAt, ndvB)
          binLo = splitAt
          acc = 0.0
          binRows = 0.0
          remaining -= need
          cursor = splitAt
        }
      }
    }
    if (binRows > 1e-9 || bins.result().isEmpty) {
      val ndvB = ndv.map(d => math.max(1L,
        math.rint(d.toDouble * binRows / total).toLong))
        .getOrElse(math.max(1L, binRows.toLong))
      bins += HistogramBin(binLo, src.last._2.toDouble, ndvB)
    }
    val out = bins.result()
    Some(Histogram(total.toDouble / out.length, out))
  }
}
