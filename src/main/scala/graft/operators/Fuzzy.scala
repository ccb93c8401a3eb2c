package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked edit-distance record linkage (graft-native extension).
  *
  * The entity-resolution primitive a curation pipeline needs when keys
  * are dirty strings (product names, author names, source titles):
  * find pairs of DISTINCT values within edit distance `maxDist` of
  * each other — without ever forming the all-pairs cross product.
  *
  * Scale shape, in order of leverage:
  *   1. COLLAPSE TO DISTINCT VALUES FIRST. Linkage is a property of
  *      the value domain, not the row stream — a 100 TB fact table
  *      with 10⁵ distinct names costs the same as a 1 GB one after
  *      the collapse (one hash aggregate, carrying the per-value row
  *      count as payload).
  *   2. BLOCK, then compare. Pairs are generated only within a
  *      blocking key (an equi-join Catalyst hash-partitions), so the
  *      quadratic term is per-block, never global. The block function
  *      must be invariant under the edits the threshold tolerates —
  *      the default blocks on the LAST whitespace token, which
  *      survives edits confined to earlier tokens (the "red gear" /
  *      "hot gear" family this query family targets; pairs whose
  *      edits touch the final token are out of recall by design and
  *      the miss is mirrored in the oracle, which blocks identically).
  *   3. Length prefilter: |len(a) − len(b)| ≤ maxDist is a necessary
  *      condition for levenshtein ≤ maxDist (each edit changes length
  *      by at most 1), so the guard is PURE pruning — results are
  *      identical with or without it, and the oracle runs without it.
  *   4. Banded levenshtein: the 3-arg `levenshtein(a, b, threshold)`
  *      computes only the |maxDist|-wide diagonal band (O(maxDist·n)
  *      per pair, not O(n²)) and returns −1 past the threshold.
  */
object Fuzzy {

  /** Default blocking key: the last whitespace token of the value. */
  def lastTokenBlock(name: Column): Column =
    element_at(split(name, " "), -1)

  /** Hot-block guard (same failure mode as [[Dedup.DefaultMaxBucket]]):
    * pair volume within a block is |block|², so one degenerate blocking
    * key — exactly the shared-final-token "Ltd"/"Inc" family T6 strips —
    * turns one task quadratic. Blocks larger than this are dropped from
    * linkage entirely (their members surface nothing; the recall gate
    * `j6_fuzzy_recall` measures the miss, and the constant is mirrored
    * literally in the DuckDB oracle so the hash check stays exact).
    */
  val DefaultMaxBlock = 1000

  /** Distinct-value linkage over a pre-collapsed entity frame.
    *
    * @param entities one row per DISTINCT entity value (callers collapse
    *                 the fact stream first — see the scaladoc), with any
    *                 payload columns to carry through (e.g. row counts)
    * @param nameCol  the string column to link on
    * @param payload  payload column names, emitted as `<c>_a` / `<c>_b`
    * @param maxDist  inclusive levenshtein threshold
    * @param maxBlock drop blocks holding more than this many distinct
    *                 values (the quadratic guard — see [[DefaultMaxBlock]])
    * @param blockFn  blocking function (edit-invariant region → key)
    * @return (block, name_a, name_b, dist, payload_a..., payload_b...)
    *         with `name_a < name_b` — each linked pair once.
    */
  def linkage(entities: DataFrame, nameCol: String, payload: Seq[String],
      maxDist: Int, maxBlock: Int = DefaultMaxBlock,
      blockFn: Column => Column = lastTokenBlock): DataFrame = {
    // the cap's window count hash-partitions on the block key — the
    // same partitioning the self-join below needs, so in the
    // shuffle-join regime (any name domain too big to broadcast, i.e.
    // whenever the guard matters) the cap rides the join's own exchange
    val blocked = entities
      .withColumn("block", blockFn(col(nameCol)))
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy(col("block"))))
      .filter(col("__bn") <= maxBlock)
    def side(tag: String) = blocked.select(
      col("block") +:
        col(nameCol).as(s"name_$tag") +:
        payload.map(c => col(c).as(s"${c}_$tag")): _*)
    val a = side("a")
    val b = side("b")
    a.join(b, Seq("block"))
      .filter(col("name_a") < col("name_b"))
      // necessary condition for dist <= maxDist: exact-safe pruning only
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      // banded levenshtein: -1 means "past the threshold"
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("block") +: col("name_a") +: col("name_b") +: col("dist") +:
        payload.flatMap(c => Seq(col(s"${c}_a"), col(s"${c}_b"))): _*)
  }
}
