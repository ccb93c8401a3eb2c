package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming substring-duplication spans — the live-crawl form of
  * [[graft.operators.Dedup.duplicateSpans]] (Lee et al., arXiv:2107.06499):
  * every `w`-token window of an arriving document is hashed, and a window
  * whose hash was ALREADY SEEN in an earlier arrival is a duplication
  * hit; per doc, overlapping hits merge into maximal spans downstream.
  *
  * Divergence from batch (and the reason it is pinned by its own scan):
  * the batch operator marks EVERY occurrence of a corpus-repeated window
  * (it sees all of them at once); a stream cannot know a window will
  * repeat later, so the FIRST arrival is admitted clean and only
  * subsequent occurrences are hits — the same first-arrival-wins rule as
  * [[StreamingParagraphDedup]], applied at window granularity.
  *
  * State per distinct window hash is ONE boolean (seen), keyed by the
  * hash and sharded across executors by the groupByKey hash — at
  * 100 TB/day the state store holds |distinct windows| booleans (`w` and
  * `stride` are the sampling knobs, exactly as in the batch pass), and
  * per-batch work is the batch's own windows. Span merging is a
  * downstream per-doc fold over this operator's decisions, bounded by
  * each document's own hit count.
  */
object StreamingSpans {

  case class WinIn(doc_id: Long, p: Long, whash: String,
      ts: java.sql.Timestamp)
  case class WinDecision(whash: String, doc_id: Long, p: Long, dup: Boolean)

  /** Use with `outputMode("append")`. Windows inside one micro-batch are
    * processed in (ts, doc_id, p) order per hash (Spark does not order
    * the group iterator), so replays are deterministic.
    */
  def firstSeenWindows(ds: Dataset[WinIn]): Dataset[WinDecision] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.whash)
      .flatMapGroupsWithState[Boolean, WinDecision](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (hash: String, wins: Iterator[WinIn], state: GroupState[Boolean]) =>
          var seen = state.getOption.getOrElse(false)
          val out = wins.toSeq.sortBy(x => (x.ts.getTime, x.doc_id, x.p))
            .map { x =>
              val dup = seen
              seen = true
              WinDecision(hash, x.doc_id, x.p, dup)
            }
          state.update(true)
          out.iterator
      }
  }

  /** Batch twin of [[firstSeenWindows]] + the downstream span merge, so
    * the driver's DuckDB oracle can hash-check the streaming semantics
    * over a bounded table: "every window occurrence except its hash's
    * first ARRIVAL is a hit" is the min-(ts, doc, p) struct per window
    * hash (one aggregate + a join back — the st9 shape), followed by the
    * SAME per-doc gaps-and-islands merge as the batch operator. A
    * singleton window is its own first arrival, so clean docs fall out
    * with zeros, and on a corpus-repeated window the arrival-earliest
    * copy reads clean here while batch [[graft.operators.Dedup.duplicateSpans]]
    * flags it — that difference is exactly what this scan pins.
    *
    * @return (docId, n_windows, n_dup_windows, n_spans, dup_tokens,
    *         max_span_tokens)
    */
  def firstSeenSpanScan(df: DataFrame, docId: String, text: Column,
      timeCol: String, w: Int, stride: Int = 1): DataFrame = {
    val (toks, wins) = graft.operators.Dedup.spanWindows(
      df, docId, text, w, stride, carry = Seq(timeCol))
    val first = wins.groupBy(col("whash"))
      .agg(min(struct(col(timeCol), col(docId), col("p"))).as("_first"))
    val hits = wins.join(first, Seq("whash"))
      .filter(!(col(timeCol) === col(s"_first.$timeCol") &&
        col(docId) === col(s"_first.$docId") &&
        col("p") === col("_first.p")))
      .select(col(docId), col("p"))
    graft.operators.Dedup.spanProfile(toks, hits, docId, w, stride)
  }
}
