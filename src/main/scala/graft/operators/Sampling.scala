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

  /** True for ~`pct`% of rows, keyed on the md5 of `key`'s string form —
    * the first 12 hex chars parsed as a 48-bit integer, mod 100.
    */
  def deterministicKeep(key: Column, pct: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 12), 16, 10)
      .cast("long") % 100 < pct

  /** SQL mirror of [[deterministicKeep]]. */
  def keepSql(keyExpr: String, pct: Int): String =
    s"('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), 1, 12))::BIGINT % 100 < $pct"
}
