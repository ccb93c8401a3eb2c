package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Streaming binary ANN candidate screen — the live-ingest form of the
  * banded-binary candidate generation
  * ([[graft.operators.Similarity.topKBinaryBanded]]'s front half, the
  * multi-index Hamming probe): an index job materializes the base
  * corpus's packed sign codes and band postings once
  * ([[graft.operators.Similarity.writeBinaryIndex]] — appends at frozen
  * layout, like the IVF-PQ postings ingest), and every ARRIVING
  * embedding is sign-quantized and sliced into its band cells (a narrow
  * per-row map) then stream-static equi-joined against the standing
  * postings on (band, band_val).
  *
  * STATELESS per micro-batch, st16's bloom-screen discipline:
  * stream-static joins keep no state store and need no watermark —
  * append mode, zero state at any corpus size. Two deliberate
  * scale-honest choices:
  *
  *  - the screen emits one row per COLLIDING BAND CELL,
  *    (new_id, base_id, band, hamming), WITHOUT the batch path's
  *    cross-band DISTINCT — a distinct over (new, base) pairs would be
  *    a streaming aggregate, i.e. unbounded pair-key state; candidate
  *    dedup belongs to the bounded exact-verify stage that consumes
  *    the screen.
  *  - a per-row `hamming <= maxHamming` cut (XOR+popcount on the
  *    joined code halves — the full-precision vectors are never read)
  *    drops the chance collisions of far pairs, so the emitted volume
  *    tracks the TRUE near-neighbor rate, not the band occupancy. With
  *    maxHamming = bands−1 the pigeonhole guarantee makes the screen
  *    complete inside the radius: any base code that close to an
  *    arrival shares ≥1 whole band, so it cannot be missed.
  */
object StreamingBinaryScreen {

  /** Screen arriving embeddings (streaming or batch; (id, vec)) against
    * the prebuilt band postings:
    * (new_id, base_id, band, hamming), one row per colliding band cell
    * within `maxHamming`. Complete for pairs within Hamming radius
    * bands−1 when maxHamming ≥ bands−1 (pigeonhole); larger thresholds
    * admit farther pairs on a collides-somewhere basis only.
    *
    * `baseBands` must carry the packed code halves on every posting
    * row — [[graft.operators.Similarity.writeBinaryIndex]]'s fmt-2
    * denormalized layout (ADVICE r19). The screen is then ONE
    * stream-static equi-join: the normalized layout forced every
    * micro-batch to first join the standing-corpus-sized codes table
    * back onto its postings, a second corpus-scale join paid per batch
    * at 100× ingest rate for 16 saved bytes/posting.
    */
  def screen(arrivals: DataFrame, baseBands: DataFrame, bands: Int,
      maxHamming: Int): DataFrame = {
    val ac = Similarity.binaryCodes(arrivals, "id", "vec")
    val ab = Similarity
      .binaryBands(ac, bands, carry = Seq("code_lo", "code_hi"))
      .select(col("id").as("new_id"), col("code_lo").as("n_lo"),
        col("code_hi").as("n_hi"), col("band"), col("band_val"))
    val sb = baseBands.select(col("id").as("base_id"), col("band"),
      col("band_val"), col("code_lo").as("b_lo"), col("code_hi").as("b_hi"))
    ab.join(sb, Seq("band", "band_val"))
      .withColumn("hamming", Similarity.hammingCodes(
        col("n_lo"), col("n_hi"), col("b_lo"), col("b_hi")).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("new_id"), col("base_id"), col("band"), col("hamming"))
  }

  /** Batch twin for the oracle: build the base codes + bands inline
    * (Verify runs against a bare sf dir with no index artifacts; the
    * slicing is static arithmetic so inline ≡ prebuilt bit-for-bit,
    * spec-pinned on the index side) and run the identical stateless
    * join chain over a bounded arrival fixture.
    */
  def screenScan(base: DataFrame, arrivals: DataFrame, bands: Int,
      maxHamming: Int): DataFrame = {
    val codes = Similarity.binaryCodes(base, "id", "vec")
    screen(arrivals,
      Similarity.binaryBands(codes, bands, carry = Seq("code_lo", "code_hi")),
      bands, maxHamming)
  }
}
