package graft

import org.apache.spark.sql.functions._
import graft.operators.{Packing, Rounding}

/** Layout-pass semantics: sliding-window chunk boundaries (overlap,
  * clipped tail, degenerate docs) and the two-phase distributed prefix
  * sum behind shard packing — which must equal the straight one-window
  * cumsum SPEC the oracle states, across bucket boundaries and
  * straddling rows.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("chunk: stride overlap, clipped tail, and the n<=C single-chunk edge") {
    val df = Seq(
      (1L, "a b c d e f g"),  // n=7, C=4, S=3 → chunks [a..d], [d..g]
      (2L, "x y"),            // n<=C → one whole-doc chunk
      (3L, "")                // split("") = [""] → one 1-token chunk
    ).toDF("doc_id", "text")
    val out = Packing.chunk(df, "doc_id", col("text"), chunkTokens = 4, stride = 3)
      .orderBy("doc_id", "chunk_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 0L, 4L), (1L, 1L, 4L), (2L, 0L, 2L), (3L, 0L, 1L)))
    // overlap: chunk 1 re-covers token 'd' (stride 3 < C 4)
    val h = out.map(_.getString(3))
    assert(h(0) != h(1) && h.distinct.length == 4)
  }

  test("chunk: every token is covered and boundaries advance by exactly stride") {
    val text = (1 to 103).map(i => s"t$i").mkString(" ")
    val out = Packing.chunk(Seq((9L, text)).toDF("doc_id", "text"),
        "doc_id", col("text"), chunkTokens = 32, stride = 24)
      .orderBy("chunk_id").collect()
    // ceil((103-32)/24)+1 = 4 chunks; tail clipped to 103-3*24 = 31
    assert(out.length == 4)
    assert(out.map(_.getLong(2)).toSeq == Seq(32L, 32L, 32L, 31L))
  }

  test("chunk: boundary sweep n=1..60 covers every residue class of the stride") {
    val docs = (1 to 60).map(n => (n.toLong, (1 to n).map(i => s"w$i").mkString(" ")))
    val out = Packing.chunk(docs.toDF("doc_id", "text"), "doc_id", col("text"),
        chunkTokens = 8, stride = 5)
      .collect().groupBy(_.getLong(0))
    for (n <- 1 to 60) {
      val rows = out(n.toLong).sortBy(_.getLong(1))
      val expected = if (n <= 8) 1 else (n - 8 + 4) / 5 + 1
      assert(rows.length == expected, s"n=$n chunk count")
      for ((r, i) <- rows.zipWithIndex)
        assert(r.getLong(2) == math.min(8, n - i * 5), s"n=$n chunk=$i length")
      // the final chunk reaches exactly token n — nothing dropped, no
      // degenerate fully-contained trailing window
      assert((rows.length - 1) * 5 + rows.last.getLong(2) == n, s"n=$n coverage")
    }
  }

  test("chunk: null text yields zero chunks (matches the SQL mirror's UNNEST-of-NULL)") {
    import spark.implicits._
    val df = Seq((1L, Some("a b c")), (2L, None)).toDF("doc_id", "text")
    val out = Packing.chunk(df, "doc_id", col("text"), chunkTokens = 2, stride = 2)
      .collect()
    assert(out.forall(_.getLong(0) == 1L))     // doc 2 emits nothing
    assert(out.forall(_.getLong(2) >= 0L))     // never the size(null) = -1 row
  }

  test("packShards: two-phase prefix sum equals the one-window cumsum spec") {
    import org.apache.spark.sql.expressions.Window
    // 3 buckets per part at bucketSize=2; weights force shard straddles;
    // the NULL part is its own layout partition (null-safe join keys —
    // a plain equi-join would silently drop those rows)
    val rows = Seq(
      (Some("en"), 0L, 9L), (Some("en"), 1L, 9L), (Some("en"), 2L, 9L),
      (Some("en"), 3L, 1L), (Some("en"), 4L, 25L), (Some("en"), 5L, 2L),
      (Some("zh"), 0L, 10L), (Some("zh"), 1L, 10L), (Some("zh"), 5L, 1L),
      (None: Option[String], 0L, 15L), (None: Option[String], 3L, 15L))
    val df = rows.toDF("lang", "doc_id", "w")
    val out = Packing.packShards(df, "lang", "doc_id", col("w"),
      budget = 10L, bucketSize = 2L)
    val spec = df.withColumn("shard_id",
      expr("coalesce(sum(w) OVER (PARTITION BY lang ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) div 10"))
    assert(out.columns.sorted.sameElements(spec.columns.sorted))
    val a = out.select("lang", "doc_id", "w", "shard_id").orderBy("lang", "doc_id").collect()
    val b = spec.select("lang", "doc_id", "w", "shard_id").orderBy("lang", "doc_id").collect()
    assert(a.sameElements(b))
    // the straddling row (offset 9, weight 9) stays in shard 0: next-fit
    // assigns by START offset; parts (incl. NULL) are independent layouts
    assert(a.map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq ==
      Seq((null, 0L, 0L), (null, 3L, 1L),
        ("en", 0L, 0L), ("en", 1L, 0L), ("en", 2L, 1L), ("en", 3L, 2L),
        ("en", 4L, 2L), ("en", 5L, 5L), ("zh", 0L, 0L), ("zh", 1L, 1L),
        ("zh", 5L, 2L)))
  }

  test("shuffleLayout: a true permutation equal to the one-window rank spec") {
    // ids crossing several h-buckets at a tiny bucket size so phase-2
    // windows and phase-1 offsets both do real work
    val ids = (0L until 257L).toDF("doc_id")
    val out = Packing.shuffleLayout(ids, "doc_id", shardSize = 10L,
        hBucketSize = 1L << 24)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // driver twin of the spec: sort by (h, id), rank positionally
    val want = (0L until 257L)
      .map(i => (i, Packing.shuffleHash(i)))
      .sortBy { case (id, h) => (h, id) }
      .zipWithIndex
      .map { case ((id, _), r) => (id, r.toLong / 10, r.toLong % 10) }
      .toSet
    assert(out.toSet == want)
    // layout is a permutation: every (shard, pos) slot distinct, shards
    // full except the last
    assert(out.map(t => (t._2, t._3)).distinct.length == 257)
    assert(out.map(_._2).max == 25L && out.count(_._2 == 25L) == 7)
    // and genuinely shuffled: not the identity order
    assert(out.sortBy(t => (t._2, t._3)).map(_._1).take(10).toSeq !=
      (0L until 10L).toSeq)
  }

  test("globalRank: dense 0-based (key, id) positions across bucket boundaries") {
    val rows = Seq((1L, 9L), (2L, 3L), (3L, 9L), (4L, 700L), (5L, 0L))
      .toDF("doc_id", "k")
    val got = Packing.globalRank(rows, "doc_id", col("k"), bucketSize = 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // (k, id) order: (0,5) (3,2) (9,1) (9,3) (700,4) — id breaks the 9-tie
    assert(got == Map(5L -> 0L, 2L -> 1L, 1L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("lengthBuckets: power-of-two boundaries and waste accounting") {
    // token counts 1, 2, 3, 4, 5, 8, 9 → buckets 0, 1, 2, 2, 3, 3, 4
    val docs = Seq("a", "a b", "a b c", "a b c d", "a b c d e",
      "a b c d e f g h", "a b c d e f g h i").toDF("text")
    val out = Packing.lengthBuckets(docs, col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).sortBy(_._1)
    assert(out.map(t => (t._1, t._2, t._3, t._4, t._5)).toSeq == Seq(
      (0L, 1L, 1L, 1L, 1L),       // n=1 pads to 1: zero waste
      (1L, 2L, 1L, 2L, 2L),       // n=2 pads to 2
      (2L, 4L, 2L, 7L, 8L),       // n=3,4 pad to 4: waste 1/8
      (3L, 8L, 2L, 13L, 16L),     // n=5,8 pad to 8
      (4L, 16L, 1L, 9L, 16L)))    // n=9 pads to 16
    assert(out.map(_._6).toSeq ==
      Seq(0.0, 0.0, 0.125, Rounding.stableVal(3.0 / 16, 4),
        Rounding.stableVal(7.0 / 16, 4)))
  }
}
