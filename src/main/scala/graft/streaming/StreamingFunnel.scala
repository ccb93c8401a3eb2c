package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel tracking — the continuous form of the batch
  * `ev_funnel` query: per user, hold the highest stage reached and its
  * event time; emit one row per stage ADVANCE (strictly-later event of
  * the next step type, same ordering rule as the batch query). Out-of-
  * order or repeated step events never move the state backwards, so
  * replaying a batch is idempotent.
  *
  * State per user is one (stage, ts) pair — constant-size; users shard
  * across executors by the groupByKey hash, and events inside a batch
  * are processed in event-time order so multi-stage jumps within one
  * batch emit every intermediate advance.
  */
object StreamingFunnel {

  case class Ev(user_id: Long, event_type: String, ts: java.sql.Timestamp)
  case class StageAdvance(user_id: Long, stage: Int, event_type: String,
      ts: java.sql.Timestamp)
  case class FunnelState(stage: Int, tsMillis: Long)

  /** Use with `outputMode("append")`. `steps` is the ordered event-type
    * sequence (e.g. view, click, purchase); stage i is reached by the
    * first `steps(i)` event strictly after the stage-(i−1) event.
    */
  def stageAdvances(ds: Dataset[Ev], steps: Seq[String]): Dataset[StageAdvance] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageAdvance](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          val out = Seq.newBuilder[StageAdvance]
          for (e <- evs.toSeq.sortBy(_.ts.getTime)) {
            if (st.stage < steps.length &&
                e.event_type == steps(st.stage) &&
                e.ts.getTime > st.tsMillis) {
              st = FunnelState(st.stage + 1, e.ts.getTime)
              out += StageAdvance(uid, st.stage, e.event_type, e.ts)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
