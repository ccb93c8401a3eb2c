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

  /** Minhash scheme: each shingle is hashed ONCE (md5 → 48-bit integer
    * via its first 12 hex nibbles), and the k signature hash functions are
    * affine derivations h_k(v) = (A_k·(v mod P) + B_k) mod P — the
    * standard permutation-family construction (what MLlib's MinHashLSH
    * does). This is ~k× cheaper than hashing every shingle k times, which
    * dominates minhash cost at scale. All arithmetic is BIGINT-exact and
    * reproduced literally in the DuckDB oracle.
    */
  val MinhashP = 1000000007L
  def minhashA(k: Int): Long = 1103515245L * (k + 1) % MinhashP
  def minhashB(k: Int): Long = 12345L * (k + 7) % MinhashP

  private val Pow16: IndexedSeq[Long] =
    (0 until 12).map(i => math.pow(16, 11 - i).toLong)

  private def nib(c: Column): Column =
    when(ascii(c) >= 97, ascii(c) - 87).otherwise(ascii(c) - 48)

  /** 48-bit integer view of a shingle array: md5 once per shingle, then
    * the first 12 hex nibbles packed positionally.
    */
  def shingleValues(shingleCol: Column): Column = {
    val hashes = transform(shingleCol, s => md5(s))
    transform(hashes, h =>
      (0 until 12).map(i => nib(substring(h, i + 1, 1)).cast("long") * Pow16(i))
        .reduce(_ + _))
  }

  /** Hash-once-per-TOKEN shingle values: each token is md5'd once
    * (nibble-packed to 48 bits) and a word-3-gram shingle's value is the
    * positional combination (a·h_i + b·h_{i+1} + h_{i+2}) mod P of its
    * token hashes. ~3× less hashing than md5-per-shingle (tokens ≪
    * shingles × length), and the resulting long arrays make the
    * verify-stage intersections integer comparisons instead of string
    * compares. Collisions (~n²/2^48) only perturb accuracy, never
    * oracle agreement — the oracle runs the identical construction.
    * Texts with <3 tokens contribute their first token hash.
    */
  val ShingleC1 = 1000003L
  val ShingleC2 = 10007L

  def tokenValues(text: Column): Column = {
    val hashes = transform(split(text, " "), t => md5(t))
    transform(hashes, h =>
      (0 until 12).map(i => nib(substring(h, i + 1, 1)).cast("long") * Pow16(i))
        .reduce(_ + _))
  }

  def shingleValuesFromTokens(tv: Column): Column = {
    val n = size(tv)
    array_distinct(
      when(n >= 3,
        transform(sequence(lit(1), n - 2), i =>
          (pmod(element_at(tv, i), lit(MinhashP)) * ShingleC1 +
            pmod(element_at(tv, i + 1), lit(MinhashP)) * ShingleC2 +
            element_at(tv, i + 2)) % MinhashP))
      .otherwise(array(element_at(tv, 1))))
  }

  /** One minhash signature value over pre-computed shingle values. */
  def minhashSig(valuesCol: Column, k: Int): Column =
    array_min(transform(valuesCol, v =>
      (pmod(v, lit(MinhashP)) * minhashA(k) + minhashB(k)) % MinhashP))

  /** LSH band keys over pre-computed shingle values: `numBands` keys,
    * each hashing `rowsPerBand` consecutive signature values. Two docs
    * collide on a band iff that band's signature slice matches exactly —
    * P(collide) = jaccard^r per band, amplified by b bands.
    */
  def bandKeys(valuesCol: Column, numBands: Int, rowsPerBand: Int): Column =
    array((0 until numBands).map { b =>
      md5(concat_ws("|", (0 until rowsPerBand).map(r =>
        minhashSig(valuesCol, b * rowsPerBand + r).cast("string")): _*))
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
    // Token-hash shingling: md5 once per TOKEN, shingle values combined
    // arithmetically (see shingleValuesFromTokens). The two-step select
    // keeps each expensive higher-order transform in its own projection
    // (multi-referenced lambdas are interpreted, not codegen'd, so
    // CollapseProject merging them would re-run the md5 transform per
    // reference).
    val withShingles = docs
      .select(col(idCol).as("id"), tokenValues(col(textCol)).as("tv"))
      .select(col("id"), shingleValuesFromTokens(col("tv")).as("sh"))
    // Candidate generation shuffles ONLY (id, band_id, band_key) — the
    // shingle arrays must never ride through the explode+self-join (at
    // scale that would serialize every array numBands× through two
    // exchanges). They are re-joined below for candidates only.
    val banded = withShingles
      .select(col("id"),
        posexplode(bandKeys(col("sh"), numBands, rowsPerBand)).as(Seq("band_id", "band_key")))
    val pairs = banded.select(col("id").as("doc_a"), col("band_id"), col("band_key"))
      .join(banded.select(col("id").as("doc_b"), col("band_id"), col("band_key")),
        Seq("band_id", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .dropDuplicates("doc_a", "doc_b")
    // Verify joins re-derive shingles from the corpus rather than
    // semi-join-pruning on a broadcast candidate-id set: deriving the id
    // set from `pairs` would force the whole banding subtree to compute
    // a second time for the broadcast (benchmarked 2× slower) — Spark
    // does not share results between a broadcast subplan and the main
    // plan. The two shingle re-derivations are narrow map work over the
    // corpus scan, and both shuffles hash on `id`, so the exchange is
    // reused between the two join builds.
    val verified = pairs
      .join(withShingles.select(col("id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(withShingles.select(col("id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      // size-ratio prefilter: jaccard <= min(|a|,|b|)/max(|a|,|b|), so a
      // pair failing the ratio can never pass the threshold — skips the
      // expensive intersect for hopeless candidates. The 1e-4 slack keeps
      // it a pure pruning bound relative to the 4-dp ROUNDED jaccard the
      // final filter uses (a ratio in [threshold-5e-5, threshold) can
      // still round up to the threshold); the oracle has no prefilter.
      .filter(least(size(col("sh_a")), size(col("sh_b"))).cast("double") /
        greatest(size(col("sh_a")), size(col("sh_b"))) >= threshold - 1e-4)
    verified
      // |A∪B| = |A|+|B|-|A∩B| on distinct arrays: one intersect per pair.
      .withColumn("__i", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", Rounding.stable(
        col("__i").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("__i")), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 32-bit SimHash fingerprint as a '0'/'1' string. Bit j is the sign of
    * Σ_tokens (parity of the j-th hex char of md5(token)) mapped to ±1 —
    * i.e. the classic weighted-bit-vote simhash with md5-derived token
    * hashes. Identical texts get identical fingerprints; near-identical
    * texts differ in few bits (hamming-band joinable via substring keys).
    *
    * Prefer [[simhashFromHashes]] over a pre-projected hash column in
    * query plans: each bit's fold re-evaluates its input array, so
    * inlining the md5 transform here costs `bits`× the hashing work.
    */
  def simhash(text: Column, bits: Int = 32): Column =
    simhashFromHashes(transform(split(text, " "), t => md5(t)), bits)

  /** SimHash over an already-materialized md5-per-token array column. */
  def simhashFromHashes(hashes: Column, bits: Int = 32): Column = {
    val bitCols = (0 until bits).map { j =>
      val vote = aggregate(hashes, lit(0),
        (acc, h) => acc + (ascii(substring(h, j + 1, 1)) % 2) * 2 - 1)
      when(vote > 0, "1").otherwise("0")
    }
    concat(bitCols: _*)
  }
}
