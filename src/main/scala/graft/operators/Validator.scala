package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based output validation (reference: src/pipeline/validator.py:25-100)
  * as ONE multi-aggregate pass — the Spark shape of E2 (SURVEY.md §3).
  *
  * Four checks, all computed in a single scan/aggregate so the validator
  * costs one job regardless of table size:
  *   A5 row count, A6 value-range violations, A7 zero-null columns,
  *   A8 null-rate threshold.
  */
object Validator {

  case class Rules(
      rangeCol: String, rangeMin: Double, rangeMax: Double,
      nonNullCols: Seq[String],
      nullRateCol: String, nullRateMax: Double)

  /** One-row DataFrame with the raw measurements (driver asserts on it). */
  def measure(df: DataFrame, rules: Rules): DataFrame = {
    def nullCount(c: String): Column =
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls")
    val rangeViolations = sum(
      when(col(rules.rangeCol).isNull ||
           !col(rules.rangeCol).between(rules.rangeMin, rules.rangeMax), 1L)
        .otherwise(0L)).as("range_violations")
    val nullRate = round(
      avg(when(col(rules.nullRateCol).isNull, 1.0).otherwise(0.0)), 4)
      .as("null_rate")
    df.agg(
      count(lit(1)).as("row_count"),
      rangeViolations +: rules.nonNullCols.map(nullCount) :+ nullRate: _*)
  }

  /** PASS/FAIL driver-side assertion, mirroring validator.py's exit gate. */
  def validate(df: DataFrame, rules: Rules, expectedRows: Option[Long]): Boolean = {
    val row = measure(df, rules).collect()(0)
    val okCount = expectedRows.forall(_ == row.getAs[Long]("row_count"))
    val okRange = row.getAs[Long]("range_violations") == 0L
    val okNulls = rules.nonNullCols.forall(c => row.getAs[Long](s"${c}_nulls") == 0L)
    val okRate  = row.getAs[Double]("null_rate") <= rules.nullRateMax
    okCount && okRange && okNulls && okRate
  }
}
