package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-stable decimal rounding.
  *
  * Spark's `round(x, n)` routes the double through
  * `BigDecimal.valueOf(x)` — i.e. the SHORTEST decimal representation —
  * so a value like 0.37924999999999997602 (shortest repr "0.37925")
  * rounds UP to 0.3793, while engines that round the binary value
  * (DuckDB, C `round`) return 0.3792. Any ratio-valued column can land on
  * such a boundary and flake an exact-match oracle.
  *
  * `stable(c, n)` = `round(c * 10^n) / 10^n`: both engines then round the
  * same product double, and a product exactly at `k + 0.5` is
  * binary-exact at that magnitude, so half-away-from-zero agrees
  * everywhere. The SQL mirror is [[stableSql]].
  */
object Rounding {
  def stable(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    round(c * f) / f
  }

  def stableSql(expr: String, scale: Int): String = {
    val f = math.pow(10, scale).toLong
    s"round(($expr) * $f) / $f"
  }

  /** Driver-side twin for tests/assertions. Half-away-from-zero on the
    * product (Spark `round` / DuckDB `round` semantics) — `math.round`
    * alone rounds halves toward +∞ and disagrees on negative exact halves
    * (-0.00005 at scale 4: 0.0 vs the engines' -0.0001).
    */
  def stableVal(x: Double, scale: Int): Double = {
    val f = math.pow(10, scale)
    val r = if (x < 0) -math.round(-x * f) else math.round(x * f)
    r.toDouble / f
  }
}
