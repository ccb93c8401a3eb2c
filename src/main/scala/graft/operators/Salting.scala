package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation by salting: the two-phase aggregation that keeps a hot
  * grouping key from serializing on one reducer.
  *
  * Phase 1 groups by (key, salt) — the hot key's rows spread over
  * `saltBuckets` reducers and partially aggregate there; phase 2 merges
  * the partials per key. For algebraic aggregates (count/sum/min/max)
  * the result is identical to a direct groupBy; the cost is one extra
  * (tiny) shuffle of partials. At 100 TB this is the difference between
  * a 10-minute straggler on the hottest stock and uniform reducers.
  *
  * The salt here is a deterministic hash of `saltCol` so replays and the
  * DuckDB oracle reproduce it; production code can use `rand()` when
  * determinism across runs is not required. (Spark's AQE skew-join
  * handles the JOIN side of skew at runtime; salting remains the tool
  * for skewed AGGREGATION keys and for deterministic plans.)
  */
object Salting {

  /** Salted sum/count: exactly `groupBy(keys).agg(count, sum(valueCol))`
    * but skew-tolerant. Output: keys..., n_rows, total.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      saltCol: String, saltBuckets: Int = 8): DataFrame = {
    val salt = pmod(col(saltCol), lit(saltBuckets)).as("__salt")
    val partial = df.groupBy((keys.map(col) :+ salt): _*)
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n_rows"), sum(col("__s")).as("total"))
  }
}
