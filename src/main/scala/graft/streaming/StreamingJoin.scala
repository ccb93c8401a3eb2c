package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the streaming form of the reference's
  * "attach news to market rows" correlation (J5 + the T8 recency window,
  * SURVEY.md §2.8: the batch recency predicate IS the time-range join
  * condition once both sides are live streams).
  *
  * Semantics: a news row attaches to every market row of the same key
  * whose event time falls within `(n_ts, n_ts + lookback]` — equivalently
  * `n_ts ∈ (m_ts − lookback, m_ts]`, the inclusive-upper/exclusive-lower
  * window of [[graft.operators.Recency.recencyWindow]].
  *
  * Scale design: the equality key makes this a hash-partitioned
  * stream-stream join (state sharded by key across executors, no
  * broadcast); the time-range predicate plus per-side watermarks lets
  * Spark expire join state older than `lookback + watermark`, so state
  * per key is bounded by the event rate within one window — the only
  * viable shape for an unbounded feed. [[intervalJoin]] is the identical
  * plan minus watermarks, which is how the DuckDB oracle pins the
  * streaming semantics (st2_interval_join).
  */
object StreamingJoin {

  /** Batch shadow: market (keyed `mKey`, event time `mTs`) ⋈ news
    * (`nKey`/`nTs`) on key equality + `nTs ∈ (mTs − lookback, mTs]`.
    * Column names must already be disambiguated by the caller.
    */
  def intervalJoin(
      market: DataFrame,
      news: DataFrame,
      mKey: String, nKey: String,
      mTs: String, nTs: String,
      lookback: String): DataFrame =
    market.join(news,
      col(mKey) === col(nKey) &&
        col(nTs) > col(mTs) - expr(s"INTERVAL $lookback") &&
        col(nTs) <= col(mTs),
      "inner")

  /** Streaming form: same join with watermarks on both event-time
    * columns (required for inner stream-stream joins — they bound the
    * buffered state on each side).
    */
  def streamIntervalJoin(
      market: DataFrame,
      news: DataFrame,
      mKey: String, nKey: String,
      mTs: String, nTs: String,
      lookback: String,
      watermark: String = "10 minutes"): DataFrame =
    intervalJoin(
      market.withWatermark(mTs, watermark),
      news.withWatermark(nTs, watermark),
      mKey, nKey, mTs, nTs, lookback)
}
