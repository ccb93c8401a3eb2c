package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the check a pipeline runs after a backfill
  * to prove the recomputed table matches the live one (the batch/
  * streaming twins in `graft.streaming` make that comparison meaningful:
  * same definitions, two execution paths). graft-native extension
  * (builder brief: operations a large-scale training-data pipeline
  * needs).
  *
  * Shape: each side reduces to (key, row-hash) in a narrow projection —
  * full rows never ride the comparison shuffle — then ONE co-partitioned
  * full-outer join on the key classifies every key as matched / changed /
  * missing / extra, and a partial-aggregated count rolls the verdict up.
  * At 100 TB both shuffles hash on the key, and with both snapshots
  * bucketed on the key (BucketingSpec's layout) the join plans with zero
  * exchanges. A Merkle-style variant (md5-XOR rollup per key-range
  * bucket) would skip the join entirely when only a pass/fail bit is
  * needed, but loses per-key attribution — the join form is the one that
  * tells you WHICH keys diverged, via [[diff]].
  */
object Reconcile {

  /** Engine-stable row hash: md5 over "|"-joined column strings. Callers
    * must pre-normalize floating-point columns to integers (e.g.
    * `floor(value * 10000)` — Spark's long cast truncates where other
    * engines round, so the floor must be explicit) — raw double-to-string
    * rendering is NOT stable across engines.
    */
  def rowHash(cols: Column*): Column = md5(concat_ws("|", cols: _*))

  /** The shared full-outer key join of two (keyCol, hashCol) snapshots,
    * hashes surfaced as h_a / h_b.
    */
  private def joined(a: DataFrame, b: DataFrame, keyCol: String,
      hashCol: String): DataFrame =
    a.select(col(keyCol), col(hashCol).as("h_a"))
      .join(b.select(col(keyCol), col(hashCol).as("h_b")),
        Seq(keyCol), "full_outer")

  /** Per-key classification of two (keyCol, hashCol) snapshots: one row
    * per key that is NOT an exact match, tagged 'changed' / 'missing'
    * (in b) / 'extra' (only in b).
    */
  def diff(a: DataFrame, b: DataFrame, keyCol: String,
      hashCol: String = "h"): DataFrame =
    joined(a, b, keyCol, hashCol)
      .withColumn("status",
        when(col("h_a").isNull, "extra")
          .when(col("h_b").isNull, "missing")
          .when(col("h_a") =!= col("h_b"), "changed"))
      .filter(col("status").isNotNull)
      .select(col(keyCol), col("status"))

  /** The one-row reconciliation verdict: matched / changed / missing /
    * extra counts over the full-outer key join. Counts coalesce to 0 so
    * two empty snapshots reconcile clean instead of returning nulls.
    */
  def counts(a: DataFrame, b: DataFrame, keyCol: String,
      hashCol: String = "h"): DataFrame =
    joined(a, b, keyCol, hashCol)
      .agg(
        coalesce(sum(when(col("h_a") === col("h_b"), 1L).otherwise(0L)), lit(0L))
          .as("n_match"),
        coalesce(sum(when(col("h_a").isNotNull && col("h_b").isNotNull &&
          col("h_a") =!= col("h_b"), 1L).otherwise(0L)), lit(0L)).as("n_changed"),
        coalesce(sum(when(col("h_b").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_missing"),
        coalesce(sum(when(col("h_a").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_extra"))
}
