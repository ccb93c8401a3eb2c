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

  /** Interval × interval overlap join (half-open semantics: overlap iff
    * `aLo < bHi && bLo < aHi`), same bin decomposition with one extra
    * rule: an overlapping pair shares EVERY bin its intersection
    * touches, so the join keeps a pair only in its canonical FIRST
    * shared bin — the bin of `greatest(aLo, bLo)` (the intersection
    * start, which both spans contain by definition). One output row per
    * overlapping pair, no dedup pass, ordinary shuffle join on the bin.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      leftLo: Column, leftHi: Column, rightLo: Column, rightHi: Column,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    for (c <- Seq("_llo", "_lhi", "_rlo", "_rhi", "_bin"))
      require(!left.columns.contains(c) && !right.columns.contains(c),
        s"intervalOverlap: inputs must not carry the internal column `$c`")
    def binned(df: DataFrame, lo: Column, hi: Column, l: String, h: String) =
      df.withColumn(l, lo.cast("long")).withColumn(h, hi.cast("long"))
        .filter(col(h) > col(l))
        .withColumn("_bin", explode(sequence(
          expr(s"$l div $binWidth"), expr(s"($h - 1) div $binWidth"))))
    val a = binned(left, leftLo, leftHi, "_llo", "_lhi")
    val b = binned(right, rightLo, rightHi, "_rlo", "_rhi")
    a.join(b, Seq("_bin"))
      .filter(col("_llo") < col("_rhi") && col("_rlo") < col("_lhi") &&
        col("_bin") === expr(s"greatest(_llo, _rlo) div $binWidth"))
      .drop("_bin", "_llo", "_lhi", "_rlo", "_rhi")
  }
}
