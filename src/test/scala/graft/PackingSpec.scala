package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

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
}
