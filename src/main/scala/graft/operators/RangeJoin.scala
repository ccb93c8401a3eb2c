package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyless point-in-interval range join, made shuffle-joinable by bin
  * decomposition — the manual form of the range-join optimization the
  * big SQL engines apply from a hint: without an equality key Spark can
  * only plan `p BETWEEN lo AND hi` as a (broadcast) nested-loop join,
  * a row-by-row scan of every interval for every point. Decomposing
  * each interval into the fixed-width bins it touches and equi-joining
  * on the POINT's bin turns it into an ordinary hash/sort-merge join:
  *
  *   points:    _bin = p div W                      (narrow)
  *   intervals: explode bins lo div W .. (hi-1) div W  (fan-out ≤ len/W + 1)
  *   join on _bin, re-filter lo <= p < hi             (exact)
  *
  * Each qualifying pair matches in EXACTLY one bin (the point's), so no
  * dedup pass is needed. `binWidth` tunes fan-out vs selectivity: set
  * it near the typical interval length so intervals explode to ~2 bins
  * and each point meets only nearby intervals. Truncating `div` is used
  * on BOTH sides, so negative coordinates bin consistently.
  *
  * Cites the reference's tolerance as-of join (market.py:124) as the
  * KEYED sibling; this operator covers the keyless case (price bands,
  * IP ranges, time brackets) the reference never needed but a general
  * engine must not plan as a cross product.
  */
object RangeJoin {

  /** Join `points` to every interval containing them: keeps all columns
    * of both inputs, output order/partitioning from the bin join.
    * Interval semantics are half-open `[lo, hi)`; empty intervals
    * (hi <= lo) match nothing and are pruned before the explode.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      point: Column, lo: Column, hi: Column, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    for (c <- Seq("_pt", "_lo", "_hi", "_bin"))
      require(!points.columns.contains(c) && !intervals.columns.contains(c),
        s"pointInInterval: inputs must not carry the internal column `$c`")
    val p = points.withColumn("_pt", point.cast("long"))
      .withColumn("_bin", expr(s"_pt div $binWidth"))
    val iv = intervals.withColumn("_lo", lo.cast("long"))
      .withColumn("_hi", hi.cast("long"))
      .filter(col("_hi") > col("_lo"))
      .withColumn("_bin", explode(sequence(
        expr(s"_lo div $binWidth"), expr(s"(_hi - 1) div $binWidth"))))
    p.join(iv, Seq("_bin"))
      .filter(col("_pt") >= col("_lo") && col("_pt") < col("_hi"))
      .drop("_bin", "_pt", "_lo", "_hi")
  }
}
