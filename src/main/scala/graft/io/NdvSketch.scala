package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.LongLeadingZeros

/** Per-column NDV (distinct-count) SKETCHES for the table format's
  * metadata layer — the HyperLogLog register array (public Flajolet et
  * al. 2007 construction; the same family behind Spark's own
  * `approx_count_distinct`), fixed at p=9 → 512 byte registers per
  * (entry, column), hex-encoded in the manifest.
  *
  * Why registers and not a number: registers MERGE — the union's
  * registers are the element-wise max of the parts' registers, exactly
  * (not approximately), so per-ENTRY sketches compose into the head
  * snapshot's estimate with zero data I/O no matter how entries come
  * and go. A rewrite/compaction produces entries WITHOUT sketches
  * (their content changed), and every consumer declines on any gap —
  * the same sound-first contract as the zone maps. Deterministic by
  * construction: xxhash64 with Spark's fixed seed, no sampling — the
  * same data always yields the same registers, so folded estimates are
  * stable across runs (a requirement for plan pinning and reproducible
  * stats).
  *
  * Estimator: the standard HLL harmonic mean with the linear-counting
  * small-range correction; at m=512 the relative standard error is
  * 1.04/√512 ≈ 4.6 % — tighter than `approx_count_distinct`'s default
  * 5 %, which is what lets [[ManifestAggFold]] answer the default call
  * from metadata without weakening the caller's contract.
  */
object NdvSketch {

  /** 2^P registers; P leading hash bits pick the register. */
  val P = 9
  val M: Int = 1 << P

  /** Relative standard error of the estimate — the fold gate:
    * a caller asking for BETTER accuracy than this must scan.
    */
  val Rsd: Double = 1.04 / math.sqrt(M.toDouble)

  private val Alpha = 0.7213 / (1.0 + 1.079 / M)

  /** Harmonic-mean HLL estimate with linear counting below 2.5·m. */
  def estimate(regs: Array[Byte]): Long = {
    require(regs.length == M, s"sketch has ${regs.length} registers, want $M")
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      invSum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val e = Alpha * M.toDouble * M.toDouble / invSum
    val corrected =
      if (e <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else e
    math.rint(corrected).toLong
  }

  /** Fold ONE hashed value into `regs` in place — the row-level twin of
    * [[bucketAndRho]]'s column form (same bucket/ρ arithmetic, so
    * registers built either way are identical). Used by the per-group
    * aggregate behind [[MatView]]'s approx-distinct state.
    */
  def update(regs: Array[Byte], h: Long): Unit = {
    val bucket = (h >>> (64 - P)).toInt
    val w = h << P
    val rho =
      if (w == 0L) 64 - P + 1
      else java.lang.Long.numberOfLeadingZeros(w) + 1
    if (rho > regs(bucket)) regs(bucket) = rho.toByte
  }

  /** Union sketch = element-wise register max — EXACT: merging per-part
    * sketches equals sketching the union in one pass.
    */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](M)
    var i = 0
    while (i < M) {
      out(i) = if (a(i) >= b(i)) a(i) else b(i)
      i += 1
    }
    out
  }

  /** Hash-DOMAIN version tag on the persisted register encoding (r21,
    * ADVICE fix). r20's [[canonical]] moved byte/short/int/float columns
    * into the widened hash domain, so registers persisted by pre-r20
    * builds describe a DIFFERENT hash function; merging the two
    * double-counts every value present on both sides (up to ~2× off,
    * far outside the promised 4.6 % rsd) with no gate tripping. The tag
    * makes the domain explicit: [[toHex]] stamps it, and every consumer
    * gates on [[isCurrent]] so an untagged (legacy-domain) register
    * string reads as a stats GAP — the decline-on-gap discipline every
    * other stats consumer follows — until a re-ANALYZE refreshes it.
    */
  val Domain = "2:"

  /** Is this persisted register string in the current hash domain? */
  def isCurrent(s: String): Boolean = s.startsWith(Domain)

  def toHex(regs: Array[Byte]): String =
    Domain + regs.map(r => f"$r%02x").mkString

  def fromHex(s: String): Array[Byte] = {
    require(isCurrent(s),
      s"NDV register string lacks the current hash-domain tag '$Domain' " +
        "— legacy-domain registers must be declined (re-ANALYZE), " +
        "never merged")
    s.substring(Domain.length).grouped(2)
      .map(h => Integer.parseInt(h, 16).toByte).toArray
  }

  /** (bucket, ρ) columns of one value column: bucket = top P hash bits,
    * ρ = leading-zero rank of the remaining bits (an all-zero tail maps
    * to the max rank 64−P+1). NULLs contribute nothing — NDV counts
    * values, matching `count(DISTINCT col)` / `approx_count_distinct`.
    */
  private def bucketAndRho(c: Column): (Column, Column) = {
    val h = xxhash64(c)
    val w = shiftleft(h, P)
    val rho = when(w === 0L, lit(64 - P + 1))
      .otherwise(ColumnBridge.column(
        LongLeadingZeros(ColumnBridge.expression(w))) + 1)
    (shiftrightunsigned(h, 64 - P).cast("int"), rho.cast("int"))
  }

  /** The hash-input form of a column: integral columns hash in the
    * LONG domain and floats in DOUBLE (r20) — xxhash64 is
    * TYPE-dependent (hash(int 5) ≠ hash(long 5)), so without the
    * canonicalization a metadata-only ALTER COLUMN TYPE widen would
    * leave old entries' registers in one hash domain and new entries'
    * in another, and the merged estimate would double-count every
    * value present on both sides of the widen. Values are preserved
    * exactly (widening casts are injective), so the registers stay a
    * correct NDV sketch of the column.
    */
  private def canonical(df: DataFrame, c: String): Column = {
    import org.apache.spark.sql.types._
    df.schema.find(_.name == c).map(_.dataType) match {
      case Some(ByteType | ShortType | IntegerType) => col(c).cast(LongType)
      case Some(FloatType) => col(c).cast(DoubleType)
      case _ => col(c)
    }
  }

  /** Does `from` → `to` leave [[canonical]]'s hash input unchanged —
    * i.e. may an ALTER COLUMN TYPE widen CARRY the registers? One
    * predicate owns the answer so the widen path can never drift from
    * the collection path: integrals all hash as LONG and floats as
    * DOUBLE, so those families are stable; anything else (int→double,
    * decimal re-encode) changes the hash input and the registers must
    * drop.
    */
  def hashStableWiden(from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    val integral: Set[DataType] =
      Set(ByteType, ShortType, IntegerType, LongType)
    (integral(from) && integral(to)) ||
      (from == FloatType && to == DoubleType)
  }

  /** Per-column register arrays over `df` — ONE Spark job: each column
    * contributes a column-pruned pass, the per-column frames union, and
    * a map-side-combined max lands ≤ cols·m tiny rows on the driver.
    */
  def sketches(df: DataFrame, cols: Seq[String]): Map[String, Array[Byte]] = {
    require(cols.nonEmpty, "ndv sketch needs at least one column")
    val parts = cols.map { c =>
      val (b, r) = bucketAndRho(canonical(df, c))
      df.filter(col(c).isNotNull)
        .select(lit(c).as("__c"), b.as("__b"), r.as("__r"))
    }
    val rows = parts.reduce(_ unionAll _)
      .groupBy("__c", "__b").agg(max("__r").as("__r"))
      .collect() // bounded: ≤ cols · 512 rows
    val regs = cols.map(_ -> new Array[Byte](M)).toMap
    rows.foreach { row =>
      regs(row.getString(0))(row.getInt(1)) = row.getInt(2).toByte
    }
    regs
  }

  /** Per-(dir, column) register arrays over a multi-dir scan carrying a
    * `__dir` column — the one-job form [[TableFormat.analyze]] uses to
    * retrofit sketches onto a standing table: grouped by (dir, column,
    * bucket) with map-side combine, then packed to one ≤512-element row
    * per (dir, column) so the driver collect is dirs·cols rows of ~0.5
    * KB, never dirs·cols·512 rows.
    */
  def sketchesByDir(tagged: DataFrame, cols: Seq[String])
      : Map[(String, String), Array[Byte]] = {
    require(cols.nonEmpty, "ndv sketch needs at least one column")
    val parts = cols.map { c =>
      val (b, r) = bucketAndRho(canonical(tagged, c))
      tagged.filter(col(c).isNotNull)
        .select(col("__dir"), lit(c).as("__c"), b.as("__b"), r.as("__r"))
    }
    val rows = parts.reduce(_ unionAll _)
      .groupBy("__dir", "__c", "__b").agg(max("__r").as("__r"))
      .groupBy("__dir", "__c")
      .agg(collect_list(struct(col("__b"), col("__r"))).as("__regs"))
      .collect()
    rows.map { row =>
      val regs = new Array[Byte](M)
      row.getSeq[org.apache.spark.sql.Row](2).foreach { p =>
        regs(p.getInt(0)) = p.getInt(1).toByte
      }
      (row.getString(0), row.getString(1)) -> regs
    }.toMap
  }
}
