package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
}
