package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order key correctness (bit-for-bit vs an independent per-bit
  * reference), the canonical Morton curve ordering, and the point of it
  * all: a two-dimensional query box intersects only a subset of
  * z-laid-out files' min/max ranges.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: place bit i of each input at 2i / 2i+1. */
  private def zRef(a: Long, b: Long): Long = {
    var r = 0L
    for (i <- 0 until 31) {
      r |= ((a >> i) & 1L) << (2 * i)
      r |= ((b >> i) & 1L) << (2 * i + 1)
    }
    r
  }

  test("zValue matches the per-bit reference on boundaries and mixed patterns") {
    val cases = Seq[(Long, Long)]((0, 0), (1, 0), (0, 1), (1, 1), (3, 2),
      (0x55555555L, 0x2AAAAAAAL), (12345, 987654321),
      (Int.MaxValue.toLong, Int.MaxValue.toLong),
      // beyond-31-bit inputs mask down, never go negative
      (1L << 40 | 7, 1L << 35 | 9))
    val out = cases.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b")).as("z"))
      .collect()
    for (r <- out) {
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == zRef(a & Int.MaxValue, b & Int.MaxValue),
        s"z($a, $b)")
      assert(r.getLong(2) >= 0L)
    }
  }

  test("sorting a 4x4 grid by z walks the canonical Morton curve") {
    val grid = for (a <- 0L to 3L; b <- 0L to 3L) yield (a, b)
    val walked = grid.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b")).as("z"))
      .orderBy("z").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(walked == Seq((0L,0L), (1L,0L), (0L,1L), (1L,1L), (2L,0L), (3L,0L),
      (2L,1L), (3L,1L), (0L,2L), (1L,2L), (0L,3L), (1L,3L), (2L,2L), (3L,2L),
      (2L,3L), (3L,3L)))
  }

  test("zOrderBy files keep min/max ranges a 2-D query box can actually prune") {
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf).select(col("user_id"),
      expr("unix_micros(ts) div 3600000000").as("hour_bucket"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    Layout.zOrderBy(ev, col("user_id"), col("hour_bucket"), numFiles = 8)
      .write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
    assert(files.size >= 4, s"expected several z-range files, got $files")
    val spans = files.map { f =>
      val r = spark.read.parquet(f).agg(
        min("user_id"), max("user_id"), min("hour_bucket"), max("hour_bucket"))
        .collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // a ~1/4 x 1/4 box in the (user, hour) plane: with the z layout only
    // files whose interleaved range crosses the box can intersect it —
    // a LINEAR sort on either single column would leave the other
    // dimension's per-file span global, so a box this small would
    // intersect every file's min/max envelope on the unsorted dimension
    val (uLo, uHi) = (spans.map(_._1).min, spans.map(_._2).max)
    val (hLo, hHi) = (spans.map(_._3).min, spans.map(_._4).max)
    val (bu0, bu1) = (uLo, uLo + (uHi - uLo) / 4)
    val (bh0, bh1) = (hLo, hLo + (hHi - hLo) / 4)
    val hit = spans.count { case (u0, u1, h0, h1) =>
      u1 >= bu0 && u0 <= bu1 && h1 >= bh0 && h0 <= bh1 }
    assert(hit < files.size,
      s"z layout prunes nothing: box hits all ${files.size} files\n$spans")
  }
}
