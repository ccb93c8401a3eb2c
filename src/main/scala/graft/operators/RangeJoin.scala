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

  import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}

  /** Coordinates must be integral ALREADY (fixed-point encode floats
    * first, e.g. `floor(x * 100)` cents): a silent cast-to-long here
    * would truncate toward zero and both invent and lose containments
    * at the boundaries (point 1.7 in [1.8, 3) would "match").
    */
  private def requireIntegral(df: DataFrame, c: Column, what: String): Unit = {
    val dt = df.select(c.as("x")).schema.head.dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$what must be an integral column (fixed-point encode first), got $dt")
  }

  /** Column-name hygiene: the internal names must be free on BOTH
    * inputs (case-insensitively — Spark resolution is case-insensitive
    * by default, so `_BIN` would be silently replaced then dropped),
    * and the two inputs' columns must be disjoint or the joined output
    * carries ambiguous duplicates that fail on first downstream use.
    */
  private def requireDisjoint(left: DataFrame, right: DataFrame,
      internal: Seq[String], op: String): Unit = {
    for (c <- internal)
      require(!left.columns.exists(_.equalsIgnoreCase(c)) &&
          !right.columns.exists(_.equalsIgnoreCase(c)),
        s"$op: inputs must not carry the internal column `$c`")
    val shared = left.columns.map(_.toLowerCase)
      .intersect(right.columns.map(_.toLowerCase))
    require(shared.isEmpty,
      s"$op: input column names must be disjoint, both sides have ${shared.mkString(", ")}")
  }

  /** Fail fast — with a readable message — on an interval whose bin
    * fan-out exceeds `maxFanout` (e.g. an open-ended sentinel hi =
    * Long.MaxValue): otherwise the explode dies deep in execution on
    * the array-size limit, or eats executor memory just below it.
    * assert_true inside a filter survives column pruning.
    */
  private def guardFanout(df: DataFrame, l: String, h: String,
      binWidth: Long, maxFanout: Long, op: String): DataFrame =
    df.filter(isnull(assert_true(
      expr(s"($h - 1) div $binWidth - $l div $binWidth") < maxFanout,
      concat(lit(s"$op: interval explodes to > $maxFanout bins of $binWidth — " +
        s"raise binWidth or cap the interval: lo="), col(l), lit(" hi="), col(h)))))

  /** Join `points` to every interval containing them: keeps all columns
    * of both inputs (names must be disjoint), output order/partitioning
    * from the bin join. Interval semantics are half-open `[lo, hi)`;
    * empty intervals (hi <= lo) match nothing and are pruned before the
    * explode.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      point: Column, lo: Column, hi: Column, binWidth: Long,
      maxFanout: Long = 1 << 16): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    requireDisjoint(points, intervals, Seq("_pt", "_lo", "_hi", "_bin"),
      "pointInInterval")
    requireIntegral(points, point, "pointInInterval: point")
    requireIntegral(intervals, lo, "pointInInterval: lo")
    requireIntegral(intervals, hi, "pointInInterval: hi")
    val p = points.withColumn("_pt", point.cast("long"))
      .withColumn("_bin", expr(s"_pt div $binWidth"))
    val iv0 = intervals.withColumn("_lo", lo.cast("long"))
      .withColumn("_hi", hi.cast("long"))
      .filter(col("_hi") > col("_lo"))
    val iv = guardFanout(iv0, "_lo", "_hi", binWidth, maxFanout, "pointInInterval")
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
      binWidth: Long, maxFanout: Long = 1 << 16): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    requireDisjoint(left, right, Seq("_llo", "_lhi", "_rlo", "_rhi", "_bin"),
      "intervalOverlap")
    for ((c, w) <- Seq(leftLo -> "leftLo", leftHi -> "leftHi"))
      requireIntegral(left, c, s"intervalOverlap: $w")
    for ((c, w) <- Seq(rightLo -> "rightLo", rightHi -> "rightHi"))
      requireIntegral(right, c, s"intervalOverlap: $w")
    def binned(df: DataFrame, lo: Column, hi: Column, l: String, h: String) = {
      val bounded = df.withColumn(l, lo.cast("long")).withColumn(h, hi.cast("long"))
        .filter(col(h) > col(l))
      guardFanout(bounded, l, h, binWidth, maxFanout, "intervalOverlap")
        .withColumn("_bin", explode(sequence(
          expr(s"$l div $binWidth"), expr(s"($h - 1) div $binWidth"))))
    }
    val a = binned(left, leftLo, leftHi, "_llo", "_lhi")
    val b = binned(right, rightLo, rightHi, "_rlo", "_rhi")
    a.join(b, Seq("_bin"))
      .filter(col("_llo") < col("_rhi") && col("_rlo") < col("_lhi") &&
        col("_bin") === expr(s"greatest(_llo, _rlo) div $binWidth"))
      .drop("_bin", "_llo", "_lhi", "_rlo", "_rhi")
  }
}
