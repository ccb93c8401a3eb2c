package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming standing-query matcher — the live form of
  * [[graft.operators.TextAnalysis.bm25TopK]]: a benchmark/alert query's
  * term set stands; every ARRIVING document is BM25-scored against
  * corpus statistics FROZEN from a calibration snapshot and emitted
  * when it clears the match threshold (the "tell me when the crawl
  * hits my benchmark query" production shape — contamination alerting,
  * topic routing).
  *
  * Because df/N/avgdl are frozen, scoring is a STATELESS narrow map —
  * no state store, no watermark, unbounded ingest at any rate; the
  * trade is online/offline skew (live scores lag corpus drift until
  * the next calibration), which is exactly what the batch twin pins:
  * [[matchScan]] self-calibrates on the same table it scores, so over
  * the calibration snapshot itself the two agree bit-for-bit.
  *
  * Arithmetic is [[graft.operators.TextAnalysis.bm25TopK]]'s
  * micro-unit form with idf/avgdl pre-folded into Scala doubles — the
  * same IEEE ops on the same values, so frozen and re-derived scores
  * are identical, not just close.
  */
object StreamingMatcher {

  /** Frozen per-term document frequencies + corpus size stats. */
  final case class FrozenStats(dfByTerm: Map[String, Long], nDocs: Long,
      totDl: Long) {
    require(nDocs > 0, "calibration snapshot is empty")
  }

  /** One bounded pass over the calibration snapshot: |terms| df rows +
    * one (count, Σdl) row — the [[graft.operators.Sampling]]
    * frozen-target pattern.
    */
  def calibrate(docs: DataFrame, textCol: String,
      terms: Seq[String]): FrozenStats = {
    val toks = split(col(textCol), " ")
    val termArr = array(terms.map(lit): _*)
    val nonNull = docs.filter(col(textCol).isNotNull)
    val df = nonNull
      .select(explode(array_distinct(filter(toks, t => array_contains(termArr, t))))
        .as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = nonNull.select(size(toks).as("dl"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).cast("long").as("td"))
      .collect()(0)
    FrozenStats(df, tot.getLong(0), tot.getLong(1))
  }

  /** Integer micro-unit BM25 of a text against the frozen stats — a
    * pure per-row expression (works on streams and tables alike).
    * Terms absent from the calibration snapshot score 0 (df = 0 would
    * make idf explode; a term nobody had at calibration cannot match
    * until recalibration — the documented frozen-stats trade).
    */
  def scoreU(textCol: Column, stats: FrozenStats, terms: Seq[String],
      k1: Double, b: Double): Column = {
    val toks = split(textCol, " ")
    val dl = size(toks)
    val avgdl = stats.totDl.toDouble / stats.nDocs
    terms.distinct.flatMap { t =>
      stats.dfByTerm.get(t).map { df =>
        val idf = (stats.nDocs - df + 0.5) / (df + 0.5)
        val tf = size(filter(toks, x => x === t))
        when(tf > 0,
          round(lit(idf) * (tf * lit(k1 + 1)) /
            (tf + lit(k1) * (lit(1 - b) + lit(b) * dl / lit(avgdl)))
            * lit(1e6)).cast("long"))
          .otherwise(lit(0L))
      }
    }.reduceOption(_ + _).getOrElse(lit(0L))
  }

  /** The live matcher: arrivals scored against `stats`, rows at or
    * above `thresholdU` micro-units emitted. Stateless — safe on a
    * stream without watermark or state store.
    */
  def matches(docs: DataFrame, idCol: String, textCol: String,
      timeCol: String, stats: FrozenStats, terms: Seq[String],
      k1: Double, b: Double, thresholdU: Long): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), col(timeCol),
        scoreU(col(textCol), stats, terms, k1, b).as("score_u"))
      .filter(col("score_u") >= thresholdU)
      .select(col(idCol), col(timeCol),
        (col("score_u").cast("double") / 1e6).as("bm25"))

  /** Batch twin: self-calibrates on the table it scores (the snapshot
    * IS the corpus), so the driver oracle can re-derive df/N/avgdl
    * relationally and hash the identical matches.
    */
  def matchScan(docs: DataFrame, idCol: String, textCol: String,
      timeCol: String, terms: Seq[String], k1: Double, b: Double,
      thresholdU: Long): DataFrame =
    matches(docs, idCol, textCol, timeCol,
      calibrate(docs, textCol, terms), terms, k1, b, thresholdU)
}
