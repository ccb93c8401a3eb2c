package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recency-window filtering and top-1-by-recency selection (reference:
  * src/providers/news.py:153-185 for NewsData, news.py:319-330 for Google)
  * plus the coalesce-fallback precedence chain (news.py:344-397).
  *
  * Scale notes: `row_number over (partition by key order by time desc)` is
  * one shuffle on `key`; with AQE skew handling a hot key (a stock with
  * millions of articles) still splits. `max_by` in a `groupBy` is the
  * map-side-combining alternative when only the top row is needed — we use
  * the window form because the fallback chain wants rank-1 *per source
  * precedence*, which composes on the same shuffle.
  */
object Recency {

  /** Keep rows within `lookbackHours` of `asOf` (reference news.py:153,
    * 163-169). `asOf` is a parameter, never `current_timestamp()`, so
    * replays are deterministic (SURVEY.md §7.4).
    */
  def recencyWindow(df: DataFrame, timeCol: String, asOf: String,
      lookbackHours: Int): DataFrame =
    df.filter(
      col(timeCol) >= to_timestamp(lit(asOf)) - expr(s"INTERVAL $lookbackHours HOURS") &&
      col(timeCol) <= to_timestamp(lit(asOf)))

  /** Rank-1 row per key by `order` (descending recency first; callers pass
    * a unique tiebreaker). Reference A1/A2.
    */
  def top1(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Coalesce-fallback chain (reference A4, news.py:344-397): among
    * candidate rows tagged with a `sourceCol`, pick per key the candidate
    * from the highest-precedence source, then the most recent within it.
    * Emits the winning source label alongside — the provenance token that
    * lands in `Data_Source_Log`.
    *
    * `precedence` lists sources from strongest to weakest (N8: Google name
    * query ≻ Google ticker ≻ NewsData name ≻ NewsData ticker).
    */
  def fallbackChain(
      candidates: DataFrame,
      keys: Seq[String],
      sourceCol: String,
      precedence: Seq[String],
      recencyOrder: Seq[Column]): DataFrame = {
    val rankExpr = precedence.zipWithIndex.foldLeft(lit(precedence.size)) {
      case (acc, (s, i)) => when(col(sourceCol) === s, lit(i)).otherwise(acc)
    }
    val ranked = candidates
      .filter(col(sourceCol).isin(precedence: _*))
      .withColumn("__prec", rankExpr)
    top1(ranked, keys, col("__prec").asc +: recencyOrder).drop("__prec")
  }
}
