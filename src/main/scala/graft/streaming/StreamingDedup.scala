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
}
