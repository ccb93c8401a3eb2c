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

  /** Driver-side twin for tests/assertions. */
  def stableVal(x: Double, scale: Int): Double = {
    val f = math.pow(10, scale)
    math.round(x * f).toDouble / f
  }
}
