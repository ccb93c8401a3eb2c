package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout keys for multi-column data skipping — the
  * standard lakehouse technique for making parquet min/max row-group
  * stats selective on MORE THAN ONE column at once: interleave the bits
  * of two sort dimensions into one key, sort/range-partition by it, and
  * a scan filtered on either (or both) dimensions prunes files whose
  * per-file ranges stay tight in both.
  *
  * graft-native extension (builder brief: design for 100 TB — at that
  * scale the cheapest query is the file you never open). The spread is
  * the classic five-step mask-and-shift Morton construction over 31-bit
  * inputs (z fits in 62 bits, so every value stays positive in signed
  * long arithmetic in both engines); pure integer bit math, so the
  * DuckDB oracle reproduces every key exactly.
  */
object Layout {

  /** (shift, mask) pairs of the even-bit spread: after the fold, bit i
    * of the 31-bit input sits at bit 2i.
    */
  private val SpreadSteps = Seq(
    16 -> 281470681808895L,    // 0x0000FFFF0000FFFF
    8 -> 71777214294589695L,   // 0x00FF00FF00FF00FF
    4 -> 1085102592571150095L, // 0x0F0F0F0F0F0F0F0F
    2 -> 3689348814741910323L, // 0x3333333333333333
    1 -> 6148914691236517205L) // 0x5555555555555555

  /** Low 31 bits of `c` spread onto the even bit positions of a long. */
  def spreadBits(c: Column): Column =
    SpreadSteps.foldLeft(c.cast("long").bitwiseAND(lit(Int.MaxValue.toLong))) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** The interleaved Morton key of two 31-bit dimensions: bit i of `a`
    * at position 2i, bit i of `b` at position 2i+1. Inputs beyond 31
    * bits are masked (callers bucket/clamp first — a layout key needs
    * locality, not injectivity).
    */
  def zValue(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** SQL mirror of [[spreadBits]]/[[zValue]], generated from the SAME
    * step constants (the minhash-oracle discipline: one source of
    * truth). The fold duplicates the operand expression per step — fine
    * for an oracle, keep `a`/`b` simple column references.
    */
  def spreadSql(e: String): String =
    SpreadSteps.foldLeft(s"(($e) & ${Int.MaxValue})") {
      case (x, (s, m)) => s"(($x | ($x << $s)) & $m)"
    }

  def zValueSql(a: String, b: String): String =
    s"${spreadSql(a)} | (${spreadSql(b)} << 1)"

  /** Range-partition and sort `df` by the z-key of the two dimensions —
    * the write-side layout pass: each output file covers one tight
    * z-range, which bounds its span in BOTH dimensions, so min/max
    * stats prune scans filtered on either. `numFiles` targets the
    * desired file size (at 100 TB: total bytes / ~1 GB).
    */
  def zOrderBy(df: DataFrame, a: Column, b: Column, numFiles: Int): DataFrame = {
    // withColumn would silently REPLACE a caller's same-named column and
    // the trailing drop would then delete their data (ignore-case:
    // Spark resolution is case-insensitive by default)
    require(!df.columns.exists(_.equalsIgnoreCase("_z")),
      "zOrderBy: input already has a `_z` column — rename it first")
    val keyed = df.withColumn("_z", zValue(a, b))
    keyed.repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }
}
