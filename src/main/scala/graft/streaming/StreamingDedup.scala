package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the streaming form of
  * [[graft.operators.Dedup.exact]] for a live document feed.
  *
  * `dropDuplicatesWithinWatermark` keys state on the content hash and
  * lets the watermark expire it: a re-crawled duplicate arriving within
  * the lateness bound is suppressed, and state stays bounded by
  * (distinct docs per watermark window) instead of growing forever —
  * the only viable shape for an unbounded 100 TB/day crawl. Batch
  * pipelines get the groupBy form; this is its streaming twin.
  */
object StreamingDedup {

  /** Emit each distinct `textCol` once per watermark window; event time
    * from `timeCol`. Output keeps the first-seen row's columns.
    */
  def exactWithinWatermark(
      df: DataFrame,
      textCol: String,
      timeCol: String,
      watermark: String = "1 hour"): DataFrame =
    df.withColumn("__text_hash", md5(col(textCol)))
      .withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark("__text_hash")
      .drop("__text_hash")

  /** Batch twin of [[exactWithinWatermark]] so the driver's DuckDB
    * oracle can hash-check the streaming operator's semantics: "emit
    * each distinct text once, first-seen wins" is, over a bounded
    * table, the (min (ts, id)) row per content hash — ONE map-side-
    * combinable hash aggregate, no window sort. (The streaming form's
    * "first" is arrival order, which for a replayed event-time-ordered
    * log is exactly this (ts, id) order.)
    *
    * @return (text_hash, idCol of the surviving row, first_ts, dup_count)
    */
  def firstSeenScan(df: DataFrame, idCol: String, textCol: String,
      timeCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(
        min_by(col(idCol), struct(col(timeCol), col(idCol))).as(idCol),
        min(col(timeCol)).as("first_ts"),
        count(lit(1)).as("dup_count"))
}
