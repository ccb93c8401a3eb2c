package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Streaming video frame-reuse screen — the live-ingest form of the
  * frame plane's candidate generation ([[graft.operators.Multimodal
  * .videoNearDupPairs]]'s front half): an index job materializes the
  * base corpus's df-capped frame-signature postings once
  * ([[graft.operators.Multimodal.writeFrameSigIndex]], frozen-layout
  * append + a measured df-drift gate), and every ARRIVING upload is
  * decoded into per-frame signatures (one per-partition flatMap — the
  * stub decoder's lifecycle, stateless) and stream-static equi-joined
  * against the standing postings on `frame_sig`.
  *
  * STATELESS per micro-batch, st16/st17's discipline: stream-static
  * joins keep no state store and need no watermark — append mode, zero
  * state at any ingest rate. The screen emits one row per (arrival
  * frame, base posting) collision, WITHOUT the batch path's per-pair
  * aggregation — shared-count/containment scoring over an unbounded
  * pair keyspace would be streaming state; it belongs to the bounded
  * verify stage that consumes the screen (e8's discipline). Hot-frame
  * emission is bounded at the SOURCE by the index's build-time df cap:
  * a boilerplate frame never enters the postings, so per-arrival
  * output is ≤ frames × dfCap.
  */
object StreamingVideoScreen {

  /** Screen arriving uploads ((doc_id, payload), streaming or batch)
    * against prebuilt df-capped postings (doc_id, frame_sig):
    * (new_id, frame_id, base_id, frame_sig), one row per colliding
    * (arrival frame, base posting).
    */
  def screen(arrivals: DataFrame, postings: DataFrame): DataFrame =
    Multimodal.frameSignatures(arrivals)
      .select(col("doc_id").as("new_id"), col("frame_id"), col("frame_sig"))
      .join(postings.select(col("doc_id").as("base_id"), col("frame_sig")),
        Seq("frame_sig"))
      .select(col("new_id"), col("frame_id"), col("base_id"),
        col("frame_sig"))
}
