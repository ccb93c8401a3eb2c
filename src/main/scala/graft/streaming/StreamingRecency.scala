package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** The streaming shadow of the news-recency operators (SURVEY.md §2.8,
  * §7.2 step 11): the reference's batch "recency window + latest
  * headline" (T8 + A1) is exactly watermark + windowed top-1 when the
  * news source becomes a stream.
  *
  *  - [[windowedLatest]] — declarative: watermark bounds lateness, the
  *    windowed `max_by` keeps one row per (key, window); append mode
  *    emits each window once, when the watermark passes its end. State is
  *    bounded by (keys × open windows) — safe at any scale; Spark drops
  *    window state as the watermark advances.
  *  - [[runningLatest]] — imperative state: `mapGroupsWithState` holds
  *    the per-key latest article and re-emits it on every update (update
  *    mode). This is the lazy-singleton "current best headline" cache of
  *    the reference (news.py cache keys) as managed streaming state.
  *
  * Both run identically on a batch DataFrame (minus the watermark
  * no-op), which is how the specs pin their semantics to the batch
  * operators.
  */
object StreamingRecency {

  case class NewsEvent(key: String, ts: java.sql.Timestamp, headline: String)
  case class KeyLatest(key: String, ts: java.sql.Timestamp, headline: String)
  case class LatestState(ts: java.sql.Timestamp, headline: String)

  /** The watermark-free aggregation shared by the streaming operator and
    * its batch shadow: most recent row per (key, tumbling window). On a
    * batch DataFrame this is the exact batch semantics of the stream —
    * which is how the DuckDB oracle checks the streaming operator
    * (st1_windowed_latest).
    */
  def windowedLatestAgg(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      headlineCol: String,
      windowLen: String): DataFrame =
    df.groupBy(col(keyCol), window(col(timeCol), windowLen))
      // tie-break: key the max_by on (ts, headline), not bare ts — two
      // events with identical ts in one (key, window) would otherwise pick
      // nondeterministically in BOTH engines and flake the oracle.
      .agg(max_by(
        struct(col(timeCol).as("ts"), col(headlineCol).as("headline")),
        struct(col(timeCol), col(headlineCol))).as("latest"))
      .select(col(keyCol), col("window.start").as("window_start"),
        col("latest.ts").as("ts"), col("latest.headline").as("headline"))

  /** T8+A1, streaming-native: most recent headline per key per
    * `windowLen` tumbling window, finalized `watermark` after the window
    * closes.
    */
  def windowedLatest(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      headlineCol: String,
      watermark: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame =
    windowedLatestAgg(df.withWatermark(timeCol, watermark),
      keyCol, timeCol, headlineCol, windowLen)

  /** A1 with explicit managed state: the running latest article per key.
    * Use with `outputMode("update")`.
    */
  def runningLatest(ds: Dataset[NewsEvent]): Dataset[KeyLatest] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .mapGroupsWithState[LatestState, KeyLatest](GroupStateTimeout.NoTimeout) {
        (key: String, events: Iterator[NewsEvent], state: GroupState[LatestState]) =>
          val candidates = events.map(e => (e.ts, e.headline)) ++
            state.getOption.map(s => (s.ts, s.headline)).iterator
          val (ts, headline) = candidates.maxBy(_._1.getTime)
          state.update(LatestState(ts, headline))
          KeyLatest(key, ts, headline)
      }
  }
}
