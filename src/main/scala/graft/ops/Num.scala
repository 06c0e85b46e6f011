package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable numeric helpers for oracle-verified outputs.
  *
  * Spark's `round(x, 4)` rounds the *shortest decimal rendering* of the
  * double (BigDecimal.valueOf semantics): round(0.38025) = 0.3803 even
  * though the binary value is 0.38024999…; DuckDB rounds the binary value
  * and yields 0.3802. Any ratio whose exact decimal expansion terminates at
  * the 5th place (denominators like 160, 800, 4000) trips this. [[r4]]
  * instead computes floor(x·10⁴ + 0.5)/10⁴ — plain IEEE multiply/add/floor/
  * divide that both engines execute bit-identically, so the comparison is
  * deterministic by construction. Use for division-derived doubles; sums of
  * DECIMAL-cast values are exact at scale ≤ 4 and keep plain `round`.
  */
object Num {

  /** Portable 4-decimal rounding (see object doc). Half-up toward +∞ for
    * negatives — the convention matters less than both engines sharing it.
    */
  def r4(c: Column): Column = floor(c * 10000 + lit(0.5)) / 10000

  /** The same formula as DuckDB SQL text. */
  def r4Sql(x: String): String = s"floor(($x) * 10000 + 0.5) / 10000"
}
