package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Rounding

/** Streaming SoftDeDup — the live-ingest form of
  * [[graft.operators.Dedup.softWeights]] at exact-text granularity:
  * every arriving document is admitted (never dropped) with a sampling
  * weight 1/occurrence-rank of its content hash, so the n-th copy of a
  * text contributes 1/n and a duplicate group's total mass grows like
  * H(n) instead of n.
  *
  * The batch form weights every member of a finished corpus uniformly
  * at 1/|cluster|; a stream cannot see future copies, so the weight is
  * front-loaded (first copy keeps 1.0) — the same
  * arrival-order-vs-global-view divergence st9/st11 pin, here at the
  * weight level. [[occurrenceWeightScan]] is the batch twin that states
  * exactly that arrival-rank rule so the driver's oracle can hash it.
  *
  * State per distinct text is ONE long (copies seen so far), keyed by
  * content hash and sharded by the groupByKey hash — the same bounded
  * cardinality as exact-dedup state at any ingest volume.
  */
object StreamingSoftWeights {

  case class DocIn(doc_id: Long, text_hash: String, ts: java.sql.Timestamp)
  case class DocWeight(doc_id: Long, text_hash: String, occurrence: Long,
      weight: Double)

  /** Use with `outputMode("append")`. Arrivals inside one micro-batch
    * are ranked in (ts, doc_id) order per hash (Spark does not order
    * the group iterator), so replays are deterministic.
    */
  def occurrenceWeights(ds: Dataset[DocIn]): Dataset[DocWeight] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.text_hash)
      .flatMapGroupsWithState[Long, DocWeight](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (hash: String, docs: Iterator[DocIn], state: GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val out = docs.toSeq.sortBy(d => (d.ts.getTime, d.doc_id))
            .map { d =>
              n += 1
              DocWeight(d.doc_id, hash, n, Rounding.stableVal(1.0 / n, 6))
            }
          state.update(n)
          out.iterator
      }
  }

  /** Batch twin of [[occurrenceWeights]] over a bounded table: the
    * occurrence rank is row_number per content hash in (ts, doc_id)
    * order — every window partition is one duplicate group (bounded by
    * the corpus's max dup count, not its size).
    *
    * @return (docId, text_hash, occurrence, weight)
    */
  def occurrenceWeightScan(df: DataFrame, docId: String, text: Column,
      timeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("text_hash"))
      .orderBy(col(timeCol), col(docId))
    df.select(col(docId), md5(text).as("text_hash"), col(timeCol))
      .withColumn("occurrence", row_number().over(w).cast("long"))
      .select(col(docId), col("text_hash"), col("occurrence"),
        Rounding.stable(lit(1.0) / col("occurrence"), 6).as("weight"))
  }
}
