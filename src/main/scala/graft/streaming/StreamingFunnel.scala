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
  /** STATE FORMAT v2: the long holds MICROseconds since epoch. v1
    * (pre-µs-precision builds) stored milliseconds in the same slot —
    * the encoded schema is identical, so a v1 checkpoint would restore
    * without a schema error. [[checkStateVersion]] ENFORCES the
    * upgrade: every state read passes a plausibility floor, so a v1
    * checkpoint fails fast with a discard-and-replay message instead
    * of silently reading every stored ts as ≈ 1970. Same-version
    * restarts round-trip losslessly (StreamingSpec restart test).
    */
  case class FunnelState(stage: Int, tsMicros: Long)

  /** The stored-long interval that can only be a v1 MILLISECOND value:
    * [1e11, 1e14) reads as the years 1973–5138 in ms (every plausible
    * v1 event time) but as 1970-01-02 – 1973-03 in µs (no plausible v2
    * event time). Below the window sits the corrupt-zero-timestamp
    * family (an upstream producer's 1970-01-01 default — genuine v2
    * state, must NOT trip the guard); above it, real µs values
    * (2024 ≈ 1.7e15). The encodings are separated by 3 orders of
    * magnitude for every realistic event time, which is what makes the
    * guard deterministic.
    */
  private[graft] val MsEraMinMicros = 100000000000L        // 1970-01-02 as µs
  private[graft] val MinPlausibleMicros = 100000000000000L // 1973-03 as µs

  /** Fail fast on a v1 (millisecond) checkpoint restored into this
    * µs-precision build. stage 0 carries the Long.MinValue init
    * sentinel in both versions and passes untouched, as do
    * corrupt-but-genuine near-epoch v2 timestamps below [[MsEraMinMicros]].
    */
  private[graft] def checkStateVersion(uid: Long, st: FunnelState): FunnelState = {
    if (st.stage > 0 && st.tsMicros >= MsEraMinMicros &&
        st.tsMicros < MinPlausibleMicros)
      throw new IllegalStateException(
        s"FunnelState for user $uid holds tsMicros=${st.tsMicros}, inside the " +
          s"millisecond-era window [$MsEraMinMicros, $MinPlausibleMicros): " +
          "this is a v1 (millisecond) funnel checkpoint restored into a " +
          "microsecond-precision build — discard the checkpoint and replay " +
          "the stream")
    st
  }

  /** Full Spark-timestamp precision (µs): getTime alone is millisecond-
    * truncated, so two events in the same millisecond would compare
    * equal and a genuinely later advance would be refused — diverging
    * from the µs-precision `>` the SQL oracle evaluates.
    */
  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000 + (ts.getNanos / 1000) % 1000

  /** Use with `outputMode("append")`. `steps` is the ordered event-type
    * sequence (e.g. view, click, purchase); stage i is reached by the
    * first `steps(i)` event strictly after the stage-(i−1) event.
    *
    * `abandonAfter` bounds state at scale: with it set (input must carry
    * a watermark on `ts`), a user idle past the horizon is dropped via
    * event-time timeout — an abandoned funnel restarts from stage 0 on
    * the next event instead of holding one state row per user ever seen.
    * Users whose events never match step 0 leave NO state behind in
    * either mode.
    */
  def stageAdvances(ds: Dataset[Ev], steps: Seq[String],
      abandonAfter: Option[java.time.Duration] = None): Dataset[StageAdvance] = {
    import ds.sparkSession.implicits._
    val timeoutConf =
      if (abandonAfter.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageAdvance](
        OutputMode.Append(), timeoutConf) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption
              .map(checkStateVersion(uid, _))
              .getOrElse(FunnelState(0, Long.MinValue))
            val out = Seq.newBuilder[StageAdvance]
            var newestMillis = Long.MinValue
            for (e <- evs.toSeq.sortBy(e => micros(e.ts))) {
              newestMillis = math.max(newestMillis, e.ts.getTime)
              if (st.stage < steps.length &&
                  e.event_type == steps(st.stage) &&
                  micros(e.ts) > st.tsMicros) {
                st = FunnelState(st.stage + 1, micros(e.ts))
                out += StageAdvance(uid, st.stage, e.event_type, e.ts)
              }
            }
            if (st.stage > 0 || state.exists) {
              state.update(st)
              abandonAfter.foreach(d => state.setTimeoutTimestamp(
                math.max(newestMillis + d.toMillis, state.getCurrentWatermarkMs() + 1)))
            }
            out.result().iterator
          }
      }
  }

  case class IdEv(user_id: Long, event_id: Long, event_type: String,
      ts: java.sql.Timestamp)

  /** Batch twin of [[stageAdvances]] so the driver's DuckDB oracle can
    * hash-check the streaming operator's semantics — the same stage
    * recurrence as one pass over a bounded table, via the
    * `flatMapSortedGroups` secondary-sort pattern (see
    * [[StreamingAlerts.thresholdAlertsScan]]): each user's events
    * arrive as ONE (ts, event_id)-ordered iterator straight off the
    * shuffle's sort, and the (stage, ts) state threads lazily as the
    * iterator is pulled — a user with a billion events streams through
    * in constant memory, no per-user array.
    */
  def stageAdvancesScan(ds: Dataset[IdEv],
      steps: Seq[String]): Dataset[StageAdvance] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.functions.asc
    ds.groupByKey(_.user_id)
      .flatMapSortedGroups(asc("ts"), asc("event_id")) {
        (uid: Long, evs: Iterator[IdEv]) =>
          var stage = 0
          var lastMicros = Long.MinValue
          evs.flatMap { e =>
            if (stage < steps.length && e.event_type == steps(stage) &&
                micros(e.ts) > lastMicros) {
              stage += 1
              lastMicros = micros(e.ts)
              Iterator.single(StageAdvance(uid, stage, e.event_type, e.ts))
            } else Iterator.empty
          }
      }
  }
}
