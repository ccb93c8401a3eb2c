package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic content-keyed sampling for training-data curation.
  *
  * graft-native extension (builder brief). A curation pipeline needs
  * reproducible subsamples (eval splits, ablation slices) that are stable
  * across runs, partitionings, and engines — which rules out RNG-based
  * `sample()` (seed × partition dependent). Hashing a stable key gives a
  * sample that is: deterministic, embarrassingly parallel (narrow map,
  * zero shuffle at any scale), stratifiable by any column, and exactly
  * reproducible in the DuckDB oracle (md5 on both engines).
  */
object Sampling {

  /** [[deterministicKeep]] with a COMPUTED per-row keep rate (a column,
    * e.g. inverse cluster size) over the same stable hash assignment —
    * rates stay independent knobs: changing one row's rate never
    * reshuffles which hash slots any other row occupies. This is THE
    * definition of the keep hash (first 12 hex chars of md5 of the
    * key's string form, as a 48-bit integer, mod 100); every other keep
    * form delegates here so the scheme lives in one Scala + one SQL
    * place.
    */
  def deterministicKeepAt(key: Column, pctCol: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 12), 16, 10)
      .cast("long") % 100 < pctCol

  /** SQL mirror of [[deterministicKeepAt]]. */
  def keepAtSql(keyExpr: String, pctExpr: String): String =
    s"('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), 1, 12))::BIGINT % 100 < ($pctExpr)"

  /** True for ~`pct`% of rows — the literal-rate form of
    * [[deterministicKeepAt]].
    */
  def deterministicKeep(key: Column, pct: Int): Column =
    deterministicKeepAt(key, lit(pct))

  /** SQL mirror of [[deterministicKeep]]. */
  def keepSql(keyExpr: String, pct: Int): String =
    keepAtSql(keyExpr, pct.toString)

  /** Deterministic train/val/test split on the SAME stable keep hash
    * ([[deterministicKeepAt]]'s 48-bit md5 slot): slot < trainPct →
    * train, < trainPct+valPct → val, else test. Content-keyed and
    * rate-independent like every other keep form — resizing one split
    * moves only the cutoff, never reshuffles assignments.
    */
  def splitAssign(key: Column, trainPct: Int, valPct: Int): Column = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"need 0 < trainPct && trainPct+valPct < 100, got $trainPct/$valPct")
    val slot = conv(substring(md5(key.cast("string")), 1, 12), 16, 10)
      .cast("long") % 100
    when(slot < trainPct, "train")
      .when(slot < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** SQL mirror of [[splitAssign]]. */
  def splitSql(keyExpr: String, trainPct: Int, valPct: Int): String = {
    val slot = s"('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), 1, 12))::BIGINT % 100"
    s"""CASE WHEN $slot < $trainPct THEN 'train'
       |     WHEN $slot < ${trainPct + valPct} THEN 'val'
       |     ELSE 'test' END""".stripMargin
  }

  /** Stratified deterministic sampling: a per-stratum keep rate (the
    * curation move that downsamples dominant languages/sources while
    * keeping the tail intact), same content-keyed hash as
    * [[deterministicKeep]] so strata rates are independent knobs over
    * ONE stable assignment — changing a rate never reshuffles which
    * rows a stratum keeps, it only moves the cutoff.
    */
  def stratifiedKeep(key: Column, stratum: Column,
      pcts: Map[String, Int], defaultPct: Int): Column = {
    val cutoff = pcts.foldLeft(when(lit(false), defaultPct)) {
      case (acc, (s, p)) => acc.when(stratum === s, p)
    }.otherwise(defaultPct)
    deterministicKeepAt(key, cutoff)
  }

  /** SQL mirror of [[stratifiedKeep]]. */
  def stratifiedKeepSql(keyExpr: String, stratumExpr: String,
      pcts: Map[String, Int], defaultPct: Int): String = {
    val cases = pcts.map { case (s, p) => s"WHEN '$s' THEN $p" }.mkString(" ")
    keepAtSql(keyExpr, s"CASE $stratumExpr $cases ELSE $defaultPct END")
  }

  /** Temperature-based source mixing (the mT5/UniMax pretraining-mix
    * rule at τ = 0.5): per-source sampling rates ∝ √count, so dominant
    * sources are downsampled sub-linearly and the tail keeps
    * proportionally more of its data, normalized to a total document
    * `budget`. Rates derive through FIXED-POINT integer arithmetic —
    * weights are `floor(√n · 10⁶)`, the normalizer an integer sum
    * (associative, order-free), the rate one integer division in
    * driver-side BigInt (exact at ANY corpus size; plan-side long
    * math would overflow past ~4·10⁸ docs per source) — so both
    * engines compute bit-identical percents with no float-fold order
    * anywhere (√ is IEEE correctly-rounded in both; the DuckDB mirror
    * floors identically in HUGEINT). The kept sample then applies
    * [[deterministicKeepAt]] over the content hash, so re-running with
    * a new budget only moves each source's cutoff.
    *
    * Scale shape: one count aggregate over the corpus collected as the
    * bounded |sources|-row dim, the rate dim broadcast back for the
    * narrow keep filter + kept-count aggregate — two corpus scans
    * total, no corpus shuffle beyond the two counts.
    *
    * @return (source, n_docs, rate_pct 0..100, n_kept)
    */
  def temperatureMix(docs: org.apache.spark.sql.DataFrame, sourceCol: String,
      keyCol: String, budget: Long): org.apache.spark.sql.DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    // ONE corpus aggregate, collected as the bounded |sources|-row dim
    // (the same bounded-collect discipline as the k-means codebooks);
    // the rate arithmetic then runs driver-side in BigInt — exact at
    // ANY corpus size (plan-side long math overflows past ~4e8 docs
    // per source), and the DuckDB mirror's HUGEINT derivation lands
    // the identical floor divisions.
    val counts = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val weighted = counts.map { case (src, n) =>
      (src, n, BigInt(math.floor(math.sqrt(n.toDouble) * 1000000L).toLong)) }
    val tot = weighted.map(_._3).sum
    val rates = weighted.map { case (src, n, w) =>
      (src, n, (BigInt(100) * BigInt(budget) * w / (tot * BigInt(n)))
        .min(BigInt(100)).toLong) }
    val session = docs.sparkSession
    import session.implicits._
    val rateDim = rates.toSeq
      .toDF(sourceCol, "n_docs", "__mix_rate") // internal name: a caller's
      // own rate_pct column must not collide at the join below
    val kept = docs
      .join(broadcast(rateDim.select(col(sourceCol), col("__mix_rate"))),
        Seq(sourceCol))
      .filter(deterministicKeepAt(col(keyCol), col("__mix_rate")))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_kept"))
    rateDim.join(kept, Seq(sourceCol), "left")
      .select(col(sourceCol), col("n_docs"), col("__mix_rate").as("rate_pct"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Per-source document TARGETS under the same τ = 0.5 temperature rule
    * as [[temperatureMix]], in COUNT form: target_s = min(n_s,
    * floor(budget · w_s / Σw)) with w_s = floor(√n_s · 10⁶). This is the
    * FROZEN calibration dim a streaming ingest enforces with per-source
    * running counts ([[graft.streaming.StreamingMix]]): rates need the
    * whole corpus to normalize, so production recomputes the dim
    * periodically and admission between refreshes is
    * first-target-arrivals per source. Same BigInt fixed-point
    * derivation as the rate form — exact at any corpus size, and the
    * DuckDB mirror's HUGEINT floor divisions land identically.
    */
  def temperatureTargets(counts: Seq[(String, Long)],
      budget: Long): Seq[(String, Long, Long)] = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val weighted = counts.sortBy(_._1).map { case (src, n) =>
      (src, n, BigInt(math.floor(math.sqrt(n.toDouble) * 1000000L).toLong)) }
    val tot = weighted.map(_._3).sum
    weighted.map { case (src, n, w) =>
      (src, n, (BigInt(budget) * w / tot).min(BigInt(n)).toLong) }
  }

  /** Per-key cap with priority keep — the domain/source-mixing stage: at
    * most `cap` rows survive per `keyCol`, highest `score` first (ties
    * to the lower `idCol`), so an over-represented domain is trimmed to
    * its best members instead of randomly. Output: (key, id, score,
    * rank 1..cap).
    *
    * Scale shape: the k-bounded [[graft.functions.TopKByScore]]
    * aggregate, not a window — each partition map-side combines to at
    * most `cap` rows per key BEFORE the shuffle, so the exchange
    * carries cap·|keys| rows no matter how hot a domain is (a
    * `row_number` window would sort an entire 100 TB domain through
    * one task).
    */
  def capPerKey(df: org.apache.spark.sql.DataFrame, keyCol: String,
      idCol: String, score: Column, cap: Int): org.apache.spark.sql.DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val top = graft.functions.TopK.topKByScore(cap)
    df.groupBy(col(keyCol))
      .agg(top(score, col(idCol)).as("__top"))
      .select(col(keyCol), posexplode(col("__top")))
      .select(col(keyCol),
        col("col._2").as(idCol),
        col("col._1").as("score"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}
