package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lag-based percent change (reference: `Close.pct_change()*100`,
  * src/providers/market.py:73-75, with the 10-day prefetch buffer at
  * market.py:43-49).
  *
  * The reference fetches a widened range so the first in-range row has a
  * previous close. In Spark the equivalent (SURVEY.md N6) is: compute
  * `lag` over the FULL history window first, apply the range filter
  * after. Catalyst cannot push the filter below the window (the window
  * reads pre-filter rows), so plan ordering alone reproduces the buffer.
  *
  * Scale: one shuffle, partitioned by `keys` — at 100 TB the quotes table
  * is hash-partitioned by instrument so each window is partition-local;
  * no skew risk because per-key history is bounded (dates × 1 row).
  */
object PctChange {

  /** Adds `outCol` = (value/prev(value) - 1) * 100 rounded to `scale` dp,
    * per key, ordered by `order` (include a unique tiebreaker column for
    * determinism).
    */
  def withPctChange(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[Column],
      valueCol: String,
      outCol: String = "pct_change",
      scale: Int = 4): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    // try_divide, not `/`: a zero previous value must yield NULL (DuckDB's
    // x/0 semantics), not an ANSI DIVIDE_BY_ZERO error — zeros exist in
    // the data at sf>=0.1 even though the reference's close prices can't
    // be zero.
    df.withColumn(outCol,
      round((try_divide(col(valueCol), lag(col(valueCol), 1).over(w)) - 1) * 100, scale))
  }
}
