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
}
