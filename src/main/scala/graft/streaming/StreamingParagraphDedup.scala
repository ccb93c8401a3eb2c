package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming paragraph-level dedup — the live-crawl form of
  * [[graft.operators.Dedup.paragraphDedup]]: boilerplate repeated across
  * documents is admitted exactly once corpus-wide, in ARRIVAL order
  * (batch keeps the (lowest doc, lowest position) copy; a stream cannot
  * see future arrivals, so first-arrival-wins is the rule real ingest
  * dedup applies — same divergence-and-reason as
  * [[StreamingQuota.admitUpTo]] vs the batch best-N cap).
  *
  * State per distinct paragraph is ONE boolean (seen), keyed by the
  * paragraph md5 and sharded across executors by the groupByKey hash —
  * at 100 TB/day the state store holds |distinct paragraphs| booleans,
  * the same cardinality any exact-dedup state carries, and the
  * per-batch work is the batch's own paragraphs. Reassembly of kept
  * paragraphs into documents is a downstream per-doc fold over this
  * operator's decisions (bounded by each document's own length).
  */
object StreamingParagraphDedup {

  case class ParaIn(doc_id: Long, para_id: Long, para_hash: String,
      ts: java.sql.Timestamp)
  case class ParaDecision(para_hash: String, doc_id: Long, para_id: Long,
      kept: Boolean)

  /** Use with `outputMode("append")`. Paragraphs inside one micro-batch
    * are processed in (ts, doc_id, para_id) order per hash (Spark does
    * not order the group iterator), so replays are deterministic.
    */
  def firstSeenParagraphs(ds: Dataset[ParaIn]): Dataset[ParaDecision] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.para_hash)
      .flatMapGroupsWithState[Boolean, ParaDecision](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (hash: String, paras: Iterator[ParaIn], state: GroupState[Boolean]) =>
          var seen = state.getOption.getOrElse(false)
          val out = paras.toSeq.sortBy(p => (p.ts.getTime, p.doc_id, p.para_id))
            .map { p =>
              val kept = !seen
              seen = true
              ParaDecision(hash, p.doc_id, p.para_id, kept)
            }
          state.update(true)
          out.iterator
      }
  }

  /** Batch twin of [[firstSeenParagraphs]] + downstream reassembly, so
    * the driver's DuckDB oracle can hash-check the streaming semantics
    * over a bounded table: "each distinct paragraph admitted at first
    * ARRIVAL" is the min-(ts, doc, pos) struct per paragraph hash — the
    * same one-aggregate-plus-join-back shape as the batch
    * [[graft.operators.Dedup.paragraphDedup]], with event time leading
    * the first-occurrence order (so a re-crawl interleaved by ts keeps
    * DIFFERENT copies than the batch (doc, pos) rule — that difference
    * is exactly what this scan pins).
    *
    * @return (docId, n_paras, n_kept, clean_text)
    */
  def firstSeenParagraphScan(df: DataFrame, docId: String, text: org.apache.spark.sql.Column,
      timeCol: String, blockTokens: Int): DataFrame = {
    val paras = graft.operators.Dedup.paragraphFrame(
      df, docId, text, blockTokens, carry = Seq(timeCol))
    val first = paras.groupBy(col("para_hash"))
      .agg(min(struct(col(timeCol), col(docId), col("para_id"))).as("_first"))
    paras.join(first, Seq("para_hash"))
      .withColumn("_keep", col(timeCol) === col(s"_first.$timeCol") &&
        col(docId) === col(s"_first.$docId") &&
        col("para_id") === col("_first.para_id"))
      .groupBy(col(docId))
      .agg(
        count(lit(1)).as("n_paras"),
        count(when(col("_keep"), 1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("_keep"),
            struct(col("para_id"), col("para_text"))))),
          x => x.getField("para_text")), " ").as("clean_text"))
  }
}
