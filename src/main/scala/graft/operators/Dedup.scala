package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH near-dup (shingle → minhash → band →
  * bucket-join → verify), and SimHash fingerprinting.
  *
  * These are graft-native extensions beyond the reference's surface (the
  * builder brief's LLM-data-pipeline pillar; SURVEY.md §7.2 step 10).
  *
  * Scale design (the 100 TB contract):
  *  - NOTHING here is all-pairs. Candidate pairs come only from equality
  *    joins on (band_id, band_key) — a hash-partitioned shuffle whose
  *    output is Σ_bucket |bucket|², bounded by the band width, never n².
  *  - Signatures/fingerprints are narrow per-row map work (array exprs
  *    over the token list) — embarrassingly parallel, no shuffle.
  *  - The verify stage (true Jaccard) runs only on banded candidates.
  *  - All hashes are md5-hex (deterministic, seed-stable across engines,
  *    and mirrorable in the DuckDB oracle). A production swap to
  *    xxhash64 is a one-line change per hash site.
  */
object Dedup {

  /** Word 3-gram shingles of a single-space-tokenized text column,
    * deduplicated. Texts with <3 tokens contribute themselves as the
    * single shingle (so short docs still band).
    */
  def shingles(text: Column): Column = {
    val toks = split(text, " ")
    val n = size(toks)
    array_distinct(
      when(n >= 3,
        transform(sequence(lit(1), n - 2), i =>
          concat_ws(" ",
            element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array(text)))
  }

  /** One minhash signature value: the lexicographic min of
    * md5(seed + "|" + shingle) over the shingle set. A string min of hex
    * digests is order-isomorphic to a numeric min of the underlying
    * 128-bit values, so this is a faithful minhash.
    */
  def minhash(shingleCol: Column, seed: Int): Column =
    array_min(transform(shingleCol, s =>
      md5(concat(lit(seed.toString), lit("|"), s))))

  /** LSH band keys: `numBands` values, each hashing `rowsPerBand`
    * consecutive signature values. Two docs collide on a band iff that
    * band's signature slice matches exactly — P(collide) = jaccard^r per
    * band, amplified by b bands.
    */
  def bandKeys(shingleCol: Column, numBands: Int, rowsPerBand: Int): Column =
    array((0 until numBands).map { b =>
      md5(concat_ws("", (0 until rowsPerBand).map(r =>
        minhash(shingleCol, b * rowsPerBand + r)): _*))
    }: _*)

  /** Exact dedup: group identical normalized text, keep the smallest id as
    * canonical. One shuffle on the text hash; at 100 TB the md5 groupBy
    * distributes uniformly (no hot keys — identical text IS the group).
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("canonical_doc_id"),
        count(lit(1)).as("dup_count"))

  /** MinHash-LSH candidate pairs with exact-Jaccard verification.
    *
    * Pipeline: shingle → `numBands`×`rowsPerBand` minhash signature →
    * explode band keys → self-equi-join on (band_id, band_key) with
    * `a.id < b.id` → distinct pairs → true Jaccard on the shingle sets →
    * keep >= `threshold`.
    *
    * @return (doc_a, doc_b, jaccard) — one row per near-dup pair.
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numBands: Int = 4,
      rowsPerBand: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val withShingles = docs.select(
      col(idCol).as("id"), shingles(col(textCol)).as("sh"))
    val banded = withShingles
      .select(col("id"), col("sh"),
        posexplode(bandKeys(col("sh"), numBands, rowsPerBand)).as(Seq("band_id", "band_key")))
    val a = banded.select(col("id").as("doc_a"), col("sh").as("sh_a"),
      col("band_id"), col("band_key"))
    val b = banded.select(col("id").as("doc_b"), col("sh").as("sh_b"),
      col("band_id"), col("band_key"))
    val pairs = a.join(b, Seq("band_id", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b")
      .dropDuplicates("doc_a", "doc_b")
    pairs
      .withColumn("jaccard", Rounding.stable(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 32-bit SimHash fingerprint as a '0'/'1' string. Bit j is the sign of
    * Σ_tokens (parity of the j-th hex char of md5(token)) mapped to ±1 —
    * i.e. the classic weighted-bit-vote simhash with md5-derived token
    * hashes. Identical texts get identical fingerprints; near-identical
    * texts differ in few bits (hamming-band joinable via substring keys).
    */
  def simhash(text: Column, bits: Int = 32): Column = {
    val hashes = transform(split(text, " "), t => md5(t))
    val bitCols = (0 until bits).map { j =>
      val vote = aggregate(hashes, lit(0),
        (acc, h) => acc + (ascii(substring(h, j + 1, 1)) % 2) * 2 - 1)
      when(vote > 0, "1").otherwise("0")
    }
    concat(bitCols: _*)
  }
}
