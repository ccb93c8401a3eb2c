package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-source admission quota — the live-crawl form of
  * [[graft.operators.Sampling.capPerKey]]'s domain-mixing cap: admit the
  * first `quota` documents per source in arrival order and suppress the
  * rest, so one exploding domain cannot flood a 100 TB/day ingest.
  *
  * State per key is ONE admitted-count long — constant per source no
  * matter how many documents arrive; keys shard across executors by the
  * groupByKey hash. (The batch cap keeps the BEST N by score; a stream
  * cannot see future scores, so the streaming quota is arrival-order by
  * construction — the same rule real crawl frontiers apply.)
  */
object StreamingQuota {

  case class Doc(source: String, doc_id: Long, ts: java.sql.Timestamp)
  case class Admitted(source: String, doc_id: Long,
      ts: java.sql.Timestamp, adm_rank: Int)

  /** Use with `outputMode("append")`. Events inside one micro-batch are
    * processed in (ts, doc_id) order per key (Spark does not order the
    * iterator), so replays are deterministic.
    */
  def admitUpTo(ds: Dataset[Doc], quota: Int): Dataset[Admitted] = {
    require(quota >= 1, s"quota must be >= 1, got $quota")
    import ds.sparkSession.implicits._
    ds.groupByKey(_.source)
      .flatMapGroupsWithState[Long, Admitted](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (src: String, docs: Iterator[Doc], state: GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          // A source already at quota skips the buffer-and-sort entirely:
          // the flooding-source case this operator exists for must stay
          // O(1) memory per batch, not O(batch) (a 10M-doc flood after
          // exhaustion would otherwise buffer and sort 10M rows in one
          // task just to emit nothing).
          if (n >= quota) Iterator.empty
          else {
            val out = Seq.newBuilder[Admitted]
            for (d <- docs.toSeq.sortBy(d => (d.ts.getTime, d.doc_id))
                 if n < quota) {
              n += 1
              out += Admitted(src, d.doc_id, d.ts, n.toInt)
            }
            state.update(n)
            out.result().iterator
          }
      }
  }

  /** Batch twin of [[admitUpTo]] so the driver's DuckDB oracle can
    * hash-check the streaming semantics: over a bounded table, "first
    * `quota` arrivals per source" is min-`quota` by (ts, id) — the
    * k-bounded TopKByScore aggregate on NEGATED event-time micros
    * (score desc ≡ ts asc; its id-asc tiebreak is exactly arrival
    * order), so each partition map-side combines to ≤ quota rows per
    * source before the shuffle and no per-source window sort ever runs.
    * The timestamp rides the score (exact: |micros| < 2^53) and is
    * reconstructed on output.
    *
    * @return (keyCol, idCol, timeCol, adm_rank 1..quota)
    */
  def admitScan(df: DataFrame, keyCol: String, idCol: String,
      timeCol: String, quota: Int): DataFrame =
    graft.operators.Sampling.capPerKey(df, keyCol, idCol,
        (-unix_micros(col(timeCol))).cast("double"), quota)
      .select(col(keyCol), col(idCol),
        timestamp_micros(-col("score").cast("long")).as(timeCol),
        col("rank").as("adm_rank"))
}
