package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-stable numeric helpers.
  *
  * `r6` rounds to 6 decimals as `floor(x*1e6 + 0.5)/1e6` — pure IEEE-754
  * double ops that evaluate bit-identically in any engine (the same
  * expression is used in the DuckDB oracle SQL). Spark's `round()` is
  * BigDecimal-HALF_UP over the double's shortest decimal representation,
  * which can disagree with a float-based `round()` on values like 2.675
  * (binary 2.67499…); sharing one float-space formula removes that whole
  * class of oracle mismatches.
  */
object Num {
  def r6(c: Column): Column = floor(c * lit(1000000.0d) + lit(0.5d)) / lit(1000000.0d)

  /** The same rounding for driver-side Scala values (e.g. the multimodal
    * decode stub).
    */
  def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** SQL text of the identical expression, for oracle generation. */
  def r6Sql(expr: String): String = s"floor(($expr) * 1000000.0 + 0.5) / 1000000.0"
}
