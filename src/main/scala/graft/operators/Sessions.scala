package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inactivity-gap sessionization — the canonical event-pipeline
  * derivation (graft-native extension; the manual twin of Spark's
  * `session_window`, which lives in the `st3_session_window` query).
  *
  * Boundary semantics: a NEW session starts when the gap from the
  * previous event is STRICTLY GREATER than `gapSeconds` — an event
  * exactly `gapSeconds` after its predecessor stays in the same session
  * (Spark's `session_window` instead splits at >=; the two queries pin
  * both conventions against oracles).
  *
  * Scale shape: the lag, the running boundary sum, and the per-session
  * aggregate all hash-partition on `keyCol`, so Catalyst plans ONE
  * exchange for the whole derivation (plan-asserted in
  * ExplainAuditSpec) — at 100 TB this is a single shuffle of the event
  * stream, with the session aggregate reusing the window's
  * partitioning.
  */
object Sessions {

  /** All input columns plus `session_id` (payload columns survive). */
  def assignIds(events: DataFrame, keyCol: String, timeCol: String,
      tieBreak: Seq[String], gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol) +: tieBreak.map(col): _*)
    events
      .withColumn("__new_sess",
        when(unix_micros(col(timeCol)) - unix_micros(lag(col(timeCol), 1).over(w))
            > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_sess")
  }

  /** One row per session: (keyCol, session_id, n_events, session_start,
    * session_end, duration_us). Integer-exact outputs only — no float
    * summation that could diverge across engines.
    */
  def aggregate(events: DataFrame, keyCol: String, timeCol: String,
      tieBreak: Seq[String], gapSeconds: Long): DataFrame =
    assignIds(events, keyCol, timeCol, tieBreak, gapSeconds)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(timeCol)).as("session_start"),
        max(col(timeCol)).as("session_end"))
      .withColumn("duration_us",
        unix_micros(col("session_end")) - unix_micros(col("session_start")))
}
