package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming OHLC bars — the real-time form of the batch `ev_ohlc_bars`
  * query: candlesticks per (key, tumbling event-time window), finalized
  * in append mode once the watermark passes the window end. open/close
  * are `min_by`/`max_by` on the (ts, id) struct exactly as in the batch
  * aggregate, so a replayed stream and the batch job produce identical
  * bars — the property that lets a backfill and the live pipeline share
  * one definition.
  *
  * State is one aggregation buffer per (key, open window) — bounded;
  * Spark drops each window's state as the watermark passes it.
  */
object StreamingBars {

  /** The watermark-free aggregation shared by the streaming operator and
    * its batch shadow.
    */
  def barsAgg(df: DataFrame, keyCol: String, timeCol: String,
      valueCol: String, idCol: String, windowLen: String): DataFrame = {
    val ord = struct(col(timeCol), col(idCol))
    df.groupBy(col(keyCol), window(col(timeCol), windowLen))
      .agg(
        min_by(col(valueCol), ord).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), ord).as("close"),
        count(lit(1)).as("volume"))
      .select(col(keyCol), col("window.start").as("bar_start"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))
  }

  /** Use with `outputMode("append")`: each bar emits once, when the
    * watermark passes its window end.
    */
  def bars(df: DataFrame, keyCol: String, timeCol: String, valueCol: String,
      idCol: String, windowLen: String, watermark: String): DataFrame =
    barsAgg(df.withWatermark(timeCol, watermark),
      keyCol, timeCol, valueCol, idCol, windowLen)
}
