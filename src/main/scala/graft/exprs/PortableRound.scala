package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable rounding to 6 decimal places.
  *
  * Spark's `round(x, 6)` rounds the SHORTEST decimal representation of the
  * double (Java `BigDecimal.valueOf`, i.e. `Double.toString`) HALF_UP, while
  * DuckDB rounds the scaled binary value (`nearbyint(x * 1e6)`, half-even).
  * Values that print as exact half-way points (e.g. 33926.77/32 =
  * "1060.2115625") therefore round differently in the two engines — the
  * round-1 `q_binary` driver hash-red (7/60000 rows off by 1e-6).
  *
  * The fix is to use the SAME pure-IEEE formula on both sides:
  * `floor(x*1e6 + 0.5) / 1e6`. Double multiplication/addition/floor/division
  * are bit-identical across engines, so Spark output and DuckDB oracle agree
  * exactly. NaN/±Inf/|x|>9e9 pass through unrounded (floor lowers to a LONG
  * in Spark; 9e9*1e6 stays well inside both Long and the 2^53 exact-integer
  * range — beyond it a 1e-6 grid is below double resolution anyway).
  */
object PortableRound {

  /** Spark-side portable 6-dp round. */
  def col6(c: Column): Column =
    when(isnan(c) || abs(c) > lit(9.0e9), c)
      .otherwise(floor(c * lit(1.0e6) + lit(0.5)) / lit(1.0e6))

  /** DuckDB-side portable 6-dp round over an SQL expression (same formula). */
  def sql6(expr: String): String =
    s"(CASE WHEN isnan(CAST(($expr) AS DOUBLE)) OR abs(CAST(($expr) AS DOUBLE)) > 9e9" +
      s" THEN CAST(($expr) AS DOUBLE)" +
      s" ELSE FLOOR(CAST(($expr) AS DOUBLE) * 1000000 + 0.5) / 1000000 END)"
}
