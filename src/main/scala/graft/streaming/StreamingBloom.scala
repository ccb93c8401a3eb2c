package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Streaming Bloom membership screen — the live-ingest form of the
  * sharded batch screen ([[graft.operators.Dedup.bloomMaybeContainsJoin]],
  * reference behavior: the pipeline's cache-hit check before any
  * expensive re-fetch, `src/core/cache.py:42-89`, generalized to corpus
  * membership): an index job materializes the base corpus's (w, m)
  * filter table once ([[graft.operators.Dedup.bloomBitsFrame]] — bit_or
  * is append-friendly, so a nightly ingest unions new positions the
  * same way IVF-PQ postings append), and the live document stream
  * screens every arriving doc against it with `BloomHashes`
  * stream-static equi-joins.
  *
  * The screen is STATELESS per micro-batch: stream-static joins keep no
  * state store and need no watermark, because the static side is fixed
  * within a batch and every output row depends on its input row alone —
  * the aggregate form's groupBy(doc) would instead put an unbounded doc
  * key domain into streaming state. Append mode, zero state at any
  * corpus size; a doc flagged `maybe_in_base` routes to exact
  * verification, a miss is certified novel (no false negatives by
  * construction, and the md5-derived positions make even the false
  * positives deterministic and oracle-checkable).
  */
object StreamingBloom {

  /** Screen `docs` (streaming or batch) against a prebuilt filter table:
    * (idCol, carry…, maybe_in_base), one row per non-null-text doc.
    */
  def screen(docs: DataFrame, idCol: String, textCol: String,
      filter: DataFrame, nWords: Long, wide: Boolean = false,
      carry: Seq[String] = Nil): DataFrame =
    Dedup.bloomMaybeContainsJoinStateless(docs, idCol, textCol, filter,
      nWords, wide, carry)

  /** Batch twin for the oracle: the same stateless join chain over the
    * bounded re-crawl fixture, plus the exact-membership measurement
    * columns (`in_base`, `is_fp`) the dedup_bloom family reports — so
    * the streaming operator's verdict semantics get a hash-checked row
    * per probe doc against the identical DuckDB SQL.
    */
  def screenScan(base: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, nWords: Long): DataFrame = {
    val verdicts = screen(batch, idCol, textCol,
      Dedup.bloomBitsFrame(base, textCol, nWords), nWords)
    val exact = base.select(md5(col(textCol)).as("__h"))
      .distinct().withColumn("__in", lit(true))
    batch.filter(col(textCol).isNotNull)
      .select(col(idCol), md5(col(textCol)).as("__h"))
      .join(verdicts, Seq(idCol))
      .join(exact, Seq("__h"), "left")
      .select(col(idCol), col("maybe_in_base"),
        coalesce(col("__in"), lit(false)).as("in_base"),
        (col("maybe_in_base") && col("__in").isNull).as("is_fp"))
  }
}
