package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trading-calendar generation (reference: `_trading_dates`,
  * src/pipeline/engine.py:248-263) and the stock×date cross product
  * (src/pipeline/engine.py:98-105).
  *
  * Spark-first shape: `sequence` + `explode` generates the rows inside the
  * engine (a Generator, no driver-side loop), then a weekday filter. The
  * cross join against a key universe is a broadcast nested-loop with the
  * tiny calendar side broadcast — at 100 TB the calendar is still a few
  * thousand rows, so this never shuffles the fact side.
  */
object Calendar {

  /** Inclusive Mon–Fri date range. Holidays intentionally NOT excluded,
    * matching engine.py:256-263.
    */
  def tradingDates(spark: SparkSession, start: String, end: String): DataFrame =
    spark.range(1)
      .select(explode(sequence(
        to_date(lit(start)), to_date(lit(end)),
        expr("interval 1 day"))).as("date"))
      // Spark dayofweek: 1=Sunday .. 7=Saturday; keep 2..6 = Mon..Fri.
      .filter(dayofweek(col("date")).between(2, 6))

  /** Output-cardinality-defining cross product: every (key, trading date)
    * pair (engine.py:98-105). `keys` must be a 1-column distinct frame.
    */
  def universe(dates: DataFrame, keys: DataFrame): DataFrame =
    broadcast(dates).crossJoin(keys)
}
