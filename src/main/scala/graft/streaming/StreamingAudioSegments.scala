package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.Multimodal

/** Streaming audio activity segmentation — the live-ingest form of
  * mm_audio_segments' gaps-and-islands fold. An upload arrives WHOLE
  * (one payload per row), so its speech/silence run structure is a pure
  * per-row function: one stateless flatMap decodes the 16-sample
  * windows and folds maximal same-flag runs in a single pass
  * ([[graft.operators.Multimodal.segmentAudio]]).
  *
  * STATELESS per micro-batch, st16's discipline: no aggregation, no
  * state store, no watermark — append mode with zero state at any
  * ingest rate. The batch query's per-doc sort + two window passes
  * exist only because batch fans the windows out as ROWS first; with
  * the payload in hand the fold needs no shuffle at all, so the live
  * plan is strictly narrower than the batch one. Bit-identical output
  * by construction (the running flag-change count IS the segment id),
  * so both forms share one DuckDB oracle.
  */
object StreamingAudioSegments {

  /** Segment arriving uploads ((doc_id, payload), streaming or batch)
    * into maximal speech/silence runs:
    * (doc_id, seg_id, is_speech, start_window, n_windows, seg_energy).
    */
  def segments(arrivals: DataFrame, threshold: Long): DataFrame =
    Multimodal.segmentAudio(arrivals, threshold)
}
