package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine-exact distributional statistics: Pearson correlation and
  * z-score anomaly ranking over INTEGER-DOMAIN moments.
  *
  * Spark ships `corr`/`covar_samp`/`stddev`, but their streaming-update
  * double accumulation is partition-order-dependent — two runs (or two
  * engines) can disagree in the last ulps, which an exact-match oracle
  * cannot tolerate. The graft forms instead aggregate the five raw
  * moments (n, Σx, Σy, Σx², Σy², Σxy) as LONG sums of long-valued inputs
  * — exact in any order, map-side combinable, ONE codegen'd hash
  * aggregate — and combine them into corr/σ in a fixed double expression
  * afterwards. From identical integer sums, IEEE gives identical doubles
  * in every engine (each cast/×/−//√ is correctly rounded), so results
  * are bit-stable without sacrificing the single-shuffle scale shape.
  *
  * Inputs must be integer-valued columns (callers fix the domain, e.g.
  * `floor(value * 100)` cents — the float→int fix itself is one
  * correctly-rounded multiply, so both engines agree on it too). Long
  * sums need n · max(x·y) < 2^63; the final combination is double, so
  * magnitudes beyond 2^53 only cost ulps, never correctness of the
  * shared value.
  */
object Stats {

  /** The five raw moments per group (plus `n`), as exact long sums.
    * Only COMPLETE pairs count: SQL `corr` drops a pair when either side
    * is null, so `n` is `count(x && y non-null)` and every sum is guarded
    * the same way — a stray null can shift neither `n` nor a sum. A group
    * with zero complete pairs still surfaces (n=0, null corr).
    */
  private def momentAggs(x: Column, y: Column): Seq[Column] = {
    val both = x.isNotNull && y.isNotNull
    def s(c: Column, name: String) = sum(when(both, c)).as(name)
    Seq(
      count(when(both, lit(1))).as("n"),
      s(x, "sx"), s(y, "sy"),
      s(x * x, "sxx"), s(y * y, "syy"), s(x * y, "sxy"))
  }

  /** The fixed double combination of the six exact moments into Pearson
    * corr: (n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²) · √(n·Σy² − Σy²)). Zero
    * variance on either side → null (0/0 → try_divide null), same as SQL
    * `corr`. n·Σx² − (Σx)² is ≥ 0 in exact arithmetic but can round a
    * hair negative once the sums pass 2^53; clamp so sqrt never NaNs.
    */
  private def corrFromMoments(nL: Column, sxL: Column, syL: Column,
      sxxL: Column, syyL: Column, sxyL: Column): Column = {
    val n = nL.cast("double")
    val (sx, sy) = (sxL.cast("double"), syL.cast("double"))
    val (sxx, syy, sxy) = (sxxL.cast("double"), syyL.cast("double"), sxyL.cast("double"))
    val cov = n * sxy - sx * sy
    val varx = greatest(n * sxx - sx * sx, lit(0.0))
    val vary = greatest(n * syy - sy * sy, lit(0.0))
    try_divide(cov, sqrt(varx) * sqrt(vary))
  }

  /** Pearson correlation per group from exact integer moments, combined
    * in double AFTER the exact aggregation (see [[corrFromMoments]]).
    *
    * @param x,y integer-valued (long) columns
    * @return one row per group: (groupCols*, n, corr) with corr
    *         stable-rounded to `scale`
    */
  def corrExact(df: DataFrame, groupCols: Seq[String], x: Column, y: Column,
      scale: Int = 6): DataFrame = {
    val aggs = momentAggs(x, y)
    val g = df.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    g.select((groupCols.map(col) :+ col("n") :+
      Rounding.stable(corrFromMoments(col("n"), col("sx"), col("sy"),
        col("sxx"), col("syy"), col("sxy")), scale).as("corr")): _*)
  }

  /** Rolling Pearson correlation over a sliding bucket window — the
    * at-scale composition of [[corrExact]] with the bucketed-rolling
    * frame (ev_rolling_bucketed): pre-aggregate the fact to
    * (key, bucket) integer-moment partials, then RANGE-frame-sum the
    * LONG moments over the trailing `lookback` buckets and combine into
    * corr in double per frame.
    *
    * Scale shape: the window shuffle carries |keys × active buckets|
    * rows of six longs — not the fact — and each frame folds ≤
    * lookback+1 partials. Long sums are exact in any order, so the
    * framed re-sums are bit-stable cross-engine exactly like the global
    * ones; the double combination runs once per output row.
    *
    * @param bucket   integer bucket column name (e.g. hours since epoch);
    *                 the RANGE frame is over its values
    * @param lookback trailing frame width in buckets (23 → 24-bucket
    *                 window)
    * @return one row per (key, bucket) present in the fact:
    *         (key, bucket, n, corr), n = complete pairs in the frame
    */
  def rollingCorr(df: DataFrame, key: String, bucket: String,
      x: Column, y: Column, lookback: Int, scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val aggs = momentAggs(x, y)
    val perBucket = df.groupBy(col(key), col(bucket))
      .agg(aggs.head, aggs.tail: _*)
    val w = Window.partitionBy(col(key)).orderBy(col(bucket))
      .rangeBetween(-lookback, 0)
    def fold(c: String) = sum(col(c)).over(w)
    perBucket.select(col(key), col(bucket),
      fold("n").as("n"),
      Rounding.stable(corrFromMoments(fold("n"), fold("sx"), fold("sy"),
        fold("sxx"), fold("syy"), fold("sxy")), scale).as("corr"))
  }

  /** Top-k most anomalous rows by |z| against PER-GROUP population
    * mean/σ — the outlier screen a curation pipeline runs before
    * training. One exact-moment aggregate over the fact (5-ish group
    * rows), broadcast back onto the unshuffled fact scan for per-row
    * scoring, then a TakeOrderedAndProject cut — the 100 TB shape: the
    * fact is read once, never repartitioned, and only k rows sort.
    *
    * z = (x − μ) / σ with μ = Σx/n and σ = √(n·Σx² − Σx²)/n, all from
    * the same exact long sums as [[corrExact]] (bit-stable cross-engine).
    *
    * @param x     integer-valued (long) scoring column
    * @param keep  extra output columns (e.g. the row id used as the
    *              deterministic tiebreak — pass it first)
    * @return k rows: (groupCols*, keep*, x as `x`, z stable-rounded) in
    *         |z|-descending order
    */
  def zscoreTopK(df: DataFrame, groupCols: Seq[String], x: Column,
      keep: Seq[String], k: Int, tiebreak: String,
      scale: Int = 4): DataFrame = {
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(count(when(x.isNotNull, lit(1))).as("n"),
        sum(x).as("sx"), sum(x * x).as("sxx"))
      .select(groupCols.map(col) :+
        (col("sx").cast("double") / col("n").cast("double")).as("mu") :+
        // clamp the radicand: exact-arithmetic ≥ 0, but double rounding
        // past 2^53 can dip it negative and sqrt(neg) = NaN
        (sqrt(greatest(col("n").cast("double") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double"), lit(0.0))) /
          col("n").cast("double")).as("sigma"): _*)
    // σ=0 → null via try_divide; any residual non-finite z (NaN input,
    // overflowed moments) maps to null too — Spark sorts NaN ABOVE every
    // double, so an unguarded NaN would squat in the top-k.
    val z0 = try_divide(x - col("mu"), col("sigma"))
    val z = when(isnan(z0), lit(null)).otherwise(z0)
    df.join(broadcast(stats), groupCols)
      .select(groupCols.map(col) ++ keep.map(col) :+
        x.as("x") :+ Rounding.stable(z, scale).as("z"): _*)
      .orderBy(abs(col("z")).desc, col(tiebreak).asc)
      .limit(k)
  }
}
