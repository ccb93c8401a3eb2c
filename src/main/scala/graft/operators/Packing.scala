package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Context-window chunking and token-budget shard packing — the two
  * layout passes a training-data pipeline runs AFTER curation: split
  * each surviving document into model-context-sized pieces, then pack
  * the pieces into fixed-budget output shards.
  *
  * graft-native extensions (builder brief: "the operations a
  * large-scale training-data pipeline would need"). Both are defined in
  * pure integer arithmetic over deterministic orderings so the DuckDB
  * oracle reproduces every assignment bit-for-bit.
  */
object Packing {

  /** Sliding-window chunking: token windows of `chunkTokens`, advancing
    * by `stride` (< chunkTokens ⇒ overlapping context, the usual
    * pretraining layout). A document with n tokens yields
    * 1 + ⌈(n − chunkTokens)/stride⌉ chunks (min 1), chunk i covering
    * tokens [i·stride, i·stride + chunkTokens) clipped to n — every
    * token lands in ≥ 1 chunk and the trailing window is short rather
    * than padded.
    *
    * Scale shape: tokenize → explode(sequence) → slice is a NARROW
    * per-row map with bounded fan-out — zero exchanges at any corpus
    * size (plan-asserted). The chunk text itself is emitted as an md5
    * so downstream equality (and the oracle) never ships token arrays.
    *
    * @return one row per (doc, chunk): (docId, chunk_id, chunk_tokens,
    *         chunk_hash)
    */
  def chunk(df: DataFrame, docId: String, text: Column,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkTokens >= stride,
      s"need 0 < stride <= chunkTokens, got stride=$stride chunk=$chunkTokens")
    // null text yields no chunks, by explicit filter: Spark's non-ANSI
    // size(null) = -1 would otherwise emit one chunk_tokens=-1 row
    // while the SQL mirror's UNNEST(generate_series(0, NULL)) emits
    // none — the engines must agree by construction, not dataset luck
    val nonNull = df.filter(text.isNotNull)
    val tv = split(text, " ")
    // integer ceil via `div` (SQL integer division — Spark's `/` is
    // double division, which floors correctly only below 2^53; keep
    // the arithmetic integral so the bound never matters).
    // n - C + (S-1) ≡ n - (C - S + 1).
    val nc = when(col("_n") <= chunkTokens, lit(1)).otherwise(
      expr(s"(_n - ${chunkTokens - stride + 1}) div $stride") + 1)
    val sliced = nonNull
      .select(col(docId), tv.as("_tv"), size(tv).as("_n"))
      .select(col(docId), col("_tv"),
        explode(sequence(lit(0), nc.cast("int") - 1)).as("_i"))
      .select(col(docId), col("_i").cast("long").as("chunk_id"),
        slice(col("_tv"), col("_i") * stride + 1, lit(chunkTokens)).as("_c"))
    sliced.select(col(docId), col("chunk_id"),
      size(col("_c")).cast("long").as("chunk_tokens"),
      md5(concat_ws(" ", col("_c"))).as("chunk_hash"))
  }

  /** SQL mirror of [[chunk]] over a DuckDB table (UNNEST of a
    * correlated generate_series; list slices clamp like Spark's).
    */
  def chunkSql(table: String, docId: String, textExpr: String,
      chunkTokens: Int, stride: Int): String =
    s"""WITH t AS (
       |  SELECT $docId, string_split($textExpr, ' ') AS tv FROM $table
       |  WHERE $textExpr IS NOT NULL),
       |n AS (
       |  SELECT $docId, tv,
       |         CASE WHEN len(tv) <= $chunkTokens THEN 1
       |              ELSE (len(tv) - $chunkTokens + ${stride - 1}) // $stride + 1
       |         END AS nc
       |  FROM t),
       |e AS (
       |  SELECT $docId, tv,
       |         UNNEST(generate_series(0, nc - 1)) AS chunk_id
       |  FROM n)
       |SELECT $docId, chunk_id,
       |       CAST(len(tv[chunk_id*$stride+1 : chunk_id*$stride+$chunkTokens]) AS BIGINT) AS chunk_tokens,
       |       md5(array_to_string(tv[chunk_id*$stride+1 : chunk_id*$stride+$chunkTokens], ' ')) AS chunk_hash
       |FROM e""".stripMargin

  /** Fixed-budget shard packing: within each `part`, lay the rows out
    * in `orderCol` order and assign each to shard ⌊offset/budget⌋,
    * where offset is the running `weight` total BEFORE the row — the
    * deterministic next-fit layout (a row straddling a boundary belongs
    * to the shard its offset starts in; no re-sorting, no best-fit
    * search, reproducible from the ordering alone).
    *
    * The running total is a TWO-PHASE distributed prefix sum, not one
    * window over the whole partition: a naive
    * `sum over (partition by part order by orderCol)` puts an entire
    * 100 TB part's rows through ONE window task. Instead rows bucket by
    * `orderCol div bucketSize`; phase 1 aggregates per-bucket totals
    * (tiny: |parts × buckets| rows) and window-sums THOSE into bucket
    * start offsets; phase 2 broadcasts the offsets back and runs the
    * per-row window inside (part, bucket) — every window partition is
    * bounded by bucketSize rows no matter how large the corpus. The
    * fact shuffles exactly once (to the phase-2 window); phase 1 costs
    * a second scan of the three narrow layout columns — the price of
    * keeping every window partition bounded (the one-window spec form
    * reads once but serializes an entire part through one task).
    *
    * @return input rows + `shard_id` (long)
    */
  def packShards(df: DataFrame, part: String, orderCol: String,
      weight: Column, budget: Long, bucketSize: Long): DataFrame = {
    require(budget > 0 && bucketSize > 0)
    // internal names must be free (ignore-case: Spark resolution is
    // case-insensitive by default) — withColumn would silently replace
    // a caller's column and the trailing drop would delete it
    for (c <- Seq("_bucket", "_offset", "_before", "_p", "_b", "_w"))
      require(!df.columns.exists(_.equalsIgnoreCase(c)),
        s"packShards: input must not carry the internal column `$c`")
    import org.apache.spark.sql.expressions.Window
    val b = df.withColumn("_bucket", expr(s"$orderCol div $bucketSize"))
    val totals = b.groupBy(col(part), col("_bucket"))
      .agg(sum(weight).as("_w"))
    val woff = Window.partitionBy(col(part)).orderBy(col("_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.select(col(part), col("_bucket"),
      coalesce(sum(col("_w")).over(woff), lit(0L)).as("_offset"))
    val wloc = Window.partitionBy(col(part), col("_bucket"))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // null-safe join keys: a NULL part is its own layout partition in
    // the one-window spec (SQL PARTITION BY groups nulls), so the
    // offsets row for the NULL group must come back to its rows — a
    // plain equi-join would silently drop them
    val off = offsets.withColumnRenamed(part, "_p").withColumnRenamed("_bucket", "_b")
    b.join(broadcast(off), col(part) <=> col("_p") && col("_bucket") <=> col("_b"))
      .withColumn("_before", col("_offset") + coalesce(sum(weight).over(wloc), lit(0L)))
      // integer div: running offsets at 100 TB exceed 2^53, where
      // Spark's double `/` would start mis-flooring
      .withColumn("shard_id", expr(s"_before div $budget"))
      .drop("_p", "_b", "_bucket", "_offset", "_before")
  }

  /** SQL mirror of [[packShards]]: the oracle states the SPEC — one
    * straight window cumsum per part — which the two-phase plan must
    * reproduce exactly (integer arithmetic throughout).
    */
  def packShardsSql(table: String, part: String, orderCol: String,
      weightExpr: String, budget: Long, selectCols: String): String =
    s"""SELECT $selectCols,
       |       CAST(COALESCE(sum($weightExpr) OVER (PARTITION BY $part ORDER BY $orderCol
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |         // $budget AS BIGINT) AS shard_id
       |FROM $table""".stripMargin

  /** glibc-LCG affine scramble of (id mod 2^31) — odd multiplier ⇒ a
    * bijection on the reduced domain, so the shuffle order is a true
    * permutation of the id order below 2^31 (above, the (h, id)
    * tie-break keeps the order total). The id is reduced BEFORE the
    * multiply: `id * mul` on a raw 2^40-range id overflows long (ANSI
    * mode throws — caught by the rank-model property test), while
    * (id % 2^31) * mul ≤ 2^62 stays exact in both engines.
    */
  val ShuffleMul = 1103515245L
  val ShuffleAdd = 12345L
  val ShuffleMod = 2147483648L // 2^31

  /** The scramble on a driver-side id — the model both engines mirror. */
  def shuffleHash(id: Long): Long =
    ((id % ShuffleMod) * ShuffleMul + ShuffleAdd) % ShuffleMod

  /** Deterministic global training-order shuffle: every epoch of LLM
    * training reads the corpus in a pseudo-random order that must be
    * reproducible (resume-from-step) and materializable WITHOUT a
    * global sort through one task. Each row gets a scrambled key
    * h(id) = (id·$ShuffleMul + $ShuffleAdd) mod 2^31, its global rank
    * in (h, id) order, and a (shard_id, shard_pos) layout slot of
    * `shardSize` rows per shard — the "shuffled shards" layout
    * (Megatron/GPT-style index files) as one declarative pass.
    *
    * Scale shape: the global rank is the same TWO-PHASE prefix count
    * [[packShards]] uses — rows bucket by `h div hBucketSize` (the h
    * domain is fixed 2^31, so the bucket table is ≤ 2^31/hBucketSize
    * rows no matter the corpus); phase 1 window-sums per-bucket COUNTS
    * into bucket start offsets (tiny), phase 2 row_numbers inside each
    * h-bucket only. No window ever sees more than one bucket's rows,
    * and the only fact shuffle is the phase-2 bucket partition.
    *
    * @return (idCol, shard_id, shard_pos)
    */
  def shuffleLayout(df: DataFrame, idCol: String, shardSize: Long,
      hBucketSize: Long = 1L << 21): DataFrame = {
    require(shardSize > 0)
    globalRank(df, idCol,
      ((col(idCol) % ShuffleMod) * ShuffleMul + ShuffleAdd) % ShuffleMod,
      hBucketSize)
      .select(col(idCol),
        expr(s"_rank div $shardSize").as("shard_id"),
        (col("_rank") % shardSize).as("shard_pos"))
  }

  /** Generalized TWO-PHASE global rank over a NON-NEGATIVE long key:
    * each row's dense 0-based position in (key, id) order, without a
    * global sort through one task. Rows bucket by `key div bucketSize`
    * (phase 1 window-sums the tiny per-bucket counts into bucket start
    * offsets; phase 2 row_numbers inside each bucket only) — the same
    * shape [[packShards]] uses for offsets and [[shuffleLayout]] for
    * shard slots; any layout pass that needs "position in global
    * <key> order" (epoch shuffle, curriculum ordering) builds on it.
    *
    * The key must be non-negative: integer `div` truncates toward zero
    * in Spark but floors in DuckDB, so a negative key would bucket
    * differently in the oracle — shift the key into [0, ∞) first.
    *
    * @return (idCol, _rank)
    */
  def globalRank(df: DataFrame, idCol: String, key: Column,
      bucketSize: Long): DataFrame = {
    require(bucketSize > 0)
    import org.apache.spark.sql.expressions.Window
    val h = df.select(col(idCol), key.cast("long").as("_k"))
      .withColumn("_bucket", expr(s"_k div $bucketSize"))
    val totals = h.groupBy(col("_bucket")).agg(count(lit(1)).as("_w"))
    // this unpartitioned window is DELIBERATE and at-scale safe: it runs
    // over the bucket-TOTALS table only (≤ keyDomain/bucketSize rows, a
    // plan constant), never the fact rows — the single-partition
    // WindowExec warning it triggers in bench logs is the bounded side
    // of the two-phase prefix sum, not a fact-table sort
    val woff = Window.orderBy(col("_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.select(col("_bucket").as("_b"),
      coalesce(sum(col("_w")).over(woff), lit(0L)).as("_offset"))
    val wloc = Window.partitionBy(col("_bucket"))
      .orderBy(col("_k"), col(idCol))
    h.join(broadcast(offsets), col("_bucket") === col("_b"))
      .select(col(idCol),
        (col("_offset") + row_number().over(wloc) - 1).as("_rank"))
  }

  /** SQL mirror of [[shuffleLayout]] — the spec is ONE global
    * row_number over (h, id); the two-phase plan must equal it.
    */
  def shuffleLayoutSql(table: String, idCol: String, shardSize: Long): String =
    s"""WITH h AS (
       |  SELECT $idCol, (($idCol % $ShuffleMod) * $ShuffleMul + $ShuffleAdd) % $ShuffleMod AS h
       |  FROM $table),
       |r AS (
       |  SELECT $idCol, row_number() OVER (ORDER BY h, $idCol) - 1 AS rnk
       |  FROM h)
       |SELECT $idCol, rnk // $shardSize AS shard_id, rnk % $shardSize AS shard_pos
       |FROM r""".stripMargin

  /** Sequence-length bucketing for batch assembly: documents group into
    * power-of-two token-length buckets (n ∈ (2^(b−1), 2^b] → bucket b,
    * pad target 2^b) and each bucket reports its doc count, true token
    * mass, padded mass, and padding-waste ratio — the measurement that
    * justifies length-bucketed batching over naive fixed-length padding
    * (waste_pct of the naive single-bucket layout is what bucketing
    * saves). One narrow map + ONE aggregate over ≤ ~40 bucket rows.
    *
    * @return (bucket_bits, pad_target, n_docs, sum_tokens,
    *         padded_tokens, waste_pct)
    */
  def lengthBuckets(df: DataFrame, text: Column): DataFrame = {
    val n = size(split(text, " "))
    // bits(n-1) = ceil(log2 n) for n ≥ 1 (n=1 → 0 → pad 2^0 = 1);
    // bin() of a long is exact where log2 on doubles can mis-round
    val b = when(n <= 1, lit(0))
      .otherwise(length(bin((n - 1).cast("long"))))
    // SQL-form shiftleft: the Scala wrapper only takes a literal shift
    val padT = expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket_bits AS INT))")
    df.filter(text.isNotNull)
      .select(b.cast("long").as("bucket_bits"), n.cast("long").as("_n"))
      .groupBy(col("bucket_bits"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_n")).as("sum_tokens"))
      .select(col("bucket_bits"), padT.as("pad_target"),
        col("n_docs"), col("sum_tokens"),
        (col("n_docs") * padT).as("padded_tokens"),
        Rounding.stable(
          (col("n_docs") * padT - col("sum_tokens")).cast("double") /
            (col("n_docs") * padT), 4).as("waste_pct"))
  }

  /** SQL mirror of [[lengthBuckets]]. */
  def lengthBucketsSql(table: String, textExpr: String): String =
    s"""WITH t AS (
       |  SELECT len(string_split($textExpr, ' ')) AS n FROM $table
       |  WHERE $textExpr IS NOT NULL),
       |b AS (
       |  SELECT CASE WHEN n <= 1 THEN 0
       |              ELSE length(bin(n - 1)) END AS bucket_bits, n
       |  FROM t),
       |g AS (
       |  SELECT CAST(bucket_bits AS BIGINT) AS bucket_bits,
       |         CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(n) AS BIGINT) AS sum_tokens
       |  FROM b GROUP BY 1)
       |SELECT bucket_bits, CAST(2 ** bucket_bits AS BIGINT) AS pad_target,
       |       n_docs, sum_tokens,
       |       CAST(n_docs * (2 ** bucket_bits) AS BIGINT) AS padded_tokens,
       |       ${Rounding.stableSql(
             "CAST(n_docs * (2 ** bucket_bits) - sum_tokens AS DOUBLE) / (n_docs * (2 ** bucket_bits))",
             4)} AS waste_pct
       |FROM g""".stripMargin
}
