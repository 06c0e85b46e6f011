package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed (the
  * classic 100 TB failure mode: one user/one order key holds 1% of the
  * fact, one task runs for hours).
  *
  * First line of defense is AQE's runtime skew-join split
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default). [[saltedJoin]]
  * is the explicit fallback for when the skewed side must join a
  * *non-broadcastable* dimension: the fact key is salted into `salts`
  * sub-keys deterministically (hash-based, reproducible — never `rand()`,
  * which breaks retry/retraction semantics), and the dimension is
  * replicated `salts` times, so the hot key spreads over `salts` tasks.
  */
object Skew {

  /** Deterministic salt in [0, salts): hash of the row's unique columns. */
  def salt(salts: Int, uniqueCols: Column*): Column =
    pmod(hash(uniqueCols: _*), lit(salts))

  /** Inner equi-join of a skewed fact to a (small but non-broadcastable)
    * dim on `key`, spreading each fact key over `salts` partitions.
    * `factUnique` must identify fact rows (used to derive the salt).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int, factUnique: Seq[String]): DataFrame = {
    val salted = fact.withColumn("__salt",
      salt(salts, factUnique.map(col): _*))
    val replicated = dim
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
