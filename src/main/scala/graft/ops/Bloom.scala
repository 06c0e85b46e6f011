package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative Bloom filter — the shuffle-avoidance primitive for
  * "big stream ⋈ small set" joins (reference semantics: pre-training
  * decontamination probes every TRAIN shingle against the TEST shingle
  * set; at 100 TB the train-shingle exchange is the pipeline's dominant
  * shuffle, and most train shingles match nothing).
  *
  * Design: the filter is a single-row DataFrame holding a `map<int,
  * bigint>` bitmap (word index → 64-bit word), built with one tiny
  * aggregation over the build side — no driver collect, no UDF, no
  * mutable state, so it broadcasts like any 1-row frame and the whole
  * prune stays inside one lazy plan. Probes are k=2 `xxhash64` bit tests,
  * pure codegen'd column expressions evaluated map-side BEFORE the big
  * side reaches its exchange.
  *
  * Correctness contract: NO FALSE NEGATIVES (a key present in the build
  * set always passes), so pruning the probe side of an equi-join never
  * changes the join result — false positives are eliminated by the exact
  * join that follows. Consumers therefore keep their oracle SQL
  * unchanged; `BloomSpec` property-tests the no-false-negative invariant.
  *
  * Sizing: [[DefaultBits]] = 2^20 ≈ 131 KiB broadcast — ~10 bits/key up
  * to ~100k build keys (fp ≈ 2-5%). At 100 TB a test split's distinct
  * shingle count is larger; m scales linearly in the `mBits` parameter
  * (Spark's own runtime row-filter sizes the same way) and the bitmap
  * stays a broadcast-sized map: 2^27 bits = 16 MiB covers ~13M keys.
  */
object Bloom {

  val DefaultBits: Int = 1 << 20

  /** Bit position for probe `seed` of `key` in an `mBits`-bit filter. */
  private def pos(key: Column, seed: Int, mBits: Int): Column =
    pmod(xxhash64(key, lit(seed)), lit(mBits.toLong))

  /** Build the filter over `keys(keyCol)`: one row, column `bm` =
    * `map<int,bigint>`. Duplicate keys are absorbed by `bit_or`, so the
    * build side needs no `distinct()` (one fewer shuffle). The two
    * aggregations are bitmap-sized (≤ mBits/64 groups), not build-sized.
    */
  def bitmap(keys: DataFrame, keyCol: String,
             mBits: Int = DefaultBits): DataFrame =
    keys
      .select(explode(array(
        pos(col(keyCol), 0, mBits),
        pos(col(keyCol), 1, mBits))).as("p"))
      .groupBy(expr("CAST(p DIV 64 AS INT)").as("w"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT)))")
        .as("bits"))
      .groupBy()
      .agg(map_from_arrays(collect_list(col("w")), collect_list(col("bits")))
        .as("bm"))

  /** Membership probe against bitmap column `bm` (from [[bitmap]]); true
    * iff both hash bits are set. Words absent from the map are all-zero
    * (`coalesce`), so an empty build set rejects everything — the correct
    * degenerate prune. Pure built-in expressions → codegen'd, map-side.
    */
  def mightContain(bm: Column, key: Column,
                   mBits: Int = DefaultBits): Column = {
    def bitSet(p: Column): Column =
      call_function("shiftleft", lit(1L), pmod(p, lit(64L)).cast("int"))
        .bitwiseAND(coalesce(
          // p < mBits ≤ 2^30, so the double division is exact
          element_at(bm, floor(p / lit(64)).cast("int")), lit(0L))) =!= 0L
    bitSet(pos(key, 0, mBits)) && bitSet(pos(key, 1, mBits))
  }

  /** Prune `df` to rows whose `keyCol` might be in `buildKeys(buildCol)`:
    * cross-joins the broadcast 1-row bitmap and filters map-side. The
    * canonical composition — callers follow with their exact join.
    */
  def prune(df: DataFrame, keyCol: String, buildKeys: DataFrame,
            buildCol: String, mBits: Int = DefaultBits): DataFrame = {
    val bm = bitmap(buildKeys, buildCol, mBits)
    df.crossJoin(broadcast(bm))
      .filter(mightContain(col("bm"), col(keyCol), mBits))
      .drop("bm")
  }
}
