package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Change-point alerts with `flatMapGroupsWithState` — the 0-or-more-
  * outputs form of custom state (vs [[StreamingRecency.runningLatest]]'s
  * exactly-one `mapGroupsWithState`): emit a row ONLY when a key's value
  * moves more than `thresholdPct` percent from the last alerted value,
  * and stay silent otherwise. The streaming shadow of the reference's
  * pct-change surface (T3) as a push-based monitor: at 100 TB/day of
  * ticks the output stream is alerts, not rows.
  *
  * State per key is one (ts, value) pair — constant; keys shard across
  * executors by the groupByKey hash.
  */
object StreamingAlerts {

  case class Tick(key: String, ts: java.sql.Timestamp, value: Double)
  case class Alert(key: String, ts: java.sql.Timestamp,
      value: Double, baseline: Double, move_pct: Double)
  case class BaselineState(ts: java.sql.Timestamp, value: Double)

  /** Use with `outputMode("append")`. Events inside one micro-batch are
    * processed in event-time order per key (the iterator is not ordered
    * by Spark), so replays are deterministic.
    */
  def thresholdAlerts(ds: Dataset[Tick], thresholdPct: Double): Dataset[Alert] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[BaselineState, Alert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: String, ticks: Iterator[Tick], state: GroupState[BaselineState]) =>
          val ordered = ticks.toSeq.sortBy(_.ts.getTime)
          val out = Seq.newBuilder[Alert]
          var baseline = state.getOption
          for (t <- ordered) {
            baseline match {
              case None =>
                baseline = Some(BaselineState(t.ts, t.value)) // first tick: arm, no alert
              case Some(b) =>
                val movePct = (t.value / b.value - 1.0) * 100.0
                if (math.abs(movePct) >= thresholdPct) {
                  out += Alert(key, t.ts, t.value, b.value,
                    graft.operators.Rounding.stableVal(movePct, 4))
                  baseline = Some(BaselineState(t.ts, t.value))
                }
            }
          }
          baseline.foreach(state.update)
          out.result().iterator
      }
  }

  case class IdTick(key: String, event_id: Long,
      ts: java.sql.Timestamp, value: Double)
  case class AlertRow(key: String, event_id: Long, ts: java.sql.Timestamp,
      value: Double, baseline: Double, move_pct: Double)

  /** Batch twin of [[thresholdAlerts]] — the SAME baseline-anchored scan
    * (alert iff the value moved ≥ `thresholdPct`% from the last ALERTED
    * value; first tick arms silently) over a bounded table, so the
    * driver's DuckDB oracle can hash-check the streaming operator's
    * semantics (a recursive-CTE walk reproduces the recurrence).
    *
    * `flatMapSortedGroups` is Spark's secondary sort: each key's ticks
    * arrive as ONE (ts, event_id)-ordered iterator straight off the
    * shuffle's sort — no per-key array materializes, so a key with a
    * billion ticks streams through in constant memory. Zero/negative
    * values must be pre-filtered (a ratio baseline of 0 is undefined).
    */
  def thresholdAlertsScan(ds: Dataset[IdTick],
      thresholdPct: Double): Dataset[AlertRow] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.functions.asc
    ds.groupByKey(_.key)
      .flatMapSortedGroups(asc("ts"), asc("event_id")) {
        (key: String, ticks: Iterator[IdTick]) =>
          // lazy flatMap, never a per-key buffer: the baseline threads
          // through as the iterator is PULLED, so a key whose every tick
          // alerts still streams in constant memory
          var baseline = Option.empty[Double]
          ticks.flatMap { t =>
            baseline match {
              case None =>
                baseline = Some(t.value); Iterator.empty
              case Some(b) =>
                val movePct = (t.value / b - 1.0) * 100.0
                if (math.abs(movePct) >= thresholdPct) {
                  baseline = Some(t.value)
                  Iterator.single(AlertRow(key, t.event_id, t.ts, t.value, b,
                    graft.operators.Rounding.stableVal(movePct, 4)))
                } else Iterator.empty
            }
          }
      }
  }
}
