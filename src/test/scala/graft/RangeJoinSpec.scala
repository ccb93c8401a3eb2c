package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Bin-decomposed range join semantics: half-open boundaries, one match
  * per qualifying pair no matter how many bins an interval spans,
  * negative coordinates under truncating div, empty-interval pruning.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def join(points: Seq[Long], ivs: Seq[(String, Long, Long)], w: Long) =
    RangeJoin.pointInInterval(
      points.toDF("p"), ivs.toDF("name", "lo", "hi"),
      col("p"), col("lo"), col("hi"), w)
      .select("p", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("half-open [lo, hi): lo is in, hi is out") {
    val out = join(Seq(10L, 20L, 15L), Seq(("a", 10L, 20L)), w = 8L)
    assert(out == Set((10L, "a"), (15L, "a")))
  }

  test("an interval spanning many bins matches each point exactly once") {
    // [0, 350) at w=100 explodes to bins 0..3; every point must pair once
    val out = RangeJoin.pointInInterval(
      Seq(50L, 250L, 349L, 350L).toDF("p"), Seq(("wide", 0L, 350L)).toDF("name", "lo", "hi"),
      col("p"), col("lo"), col("hi"), 100L)
      .collect()
    assert(out.length == 3) // 350 excluded; NO duplicate rows for any point
  }

  test("negative coordinates bin consistently (truncating div both sides)") {
    val out = join(Seq(-150L, -50L, -1L, 0L, 99L),
      Seq(("neg", -180L, -120L), ("cross", -60L, 60L)), w = 100L)
    assert(out == Set((-150L, "neg"), (-50L, "cross"), (-1L, "cross"), (0L, "cross")))
  }

  test("empty and inverted intervals match nothing; overlapping intervals both match") {
    val out = join(Seq(5L),
      Seq(("empty", 5L, 5L), ("inverted", 9L, 2L), ("a", 0L, 10L), ("b", 5L, 6L)), w = 4L)
    assert(out == Set((5L, "a"), (5L, "b")))
  }

  test("intervalOverlap: touching intervals don't overlap; containment pairs once") {
    val a = Seq(("a1", 0L, 10L), ("a2", 10L, 20L), ("a3", 0L, 1000L)).toDF("an", "alo", "ahi")
    val b = Seq(("b1", 5L, 15L), ("b2", 150L, 350L)).toDF("bn", "blo", "bhi")
    val out = RangeJoin.intervalOverlap(a, b, col("alo"), col("ahi"),
        col("blo"), col("bhi"), binWidth = 100L)
      .select("an", "bn").collect().map(r => (r.getString(0), r.getString(1)))
    // a3 contains b2, and they SHARE bins 1,2,3 — the canonical-first-bin
    // rule must still pair them exactly once
    assert(out.toSet == Set(("a1", "b1"), ("a2", "b1"), ("a3", "b1"), ("a3", "b2")))
    assert(out.length == 4, s"duplicate pairs: ${out.toSeq}")
  }

  test("guards: non-integral coordinates, colliding/shared names, runaway fan-out all fail fast") {
    val p = Seq(1.5d).toDF("p")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p, Seq((0L, 10L)).toDF("lo", "hi"),
        col("p"), col("lo"), col("hi"), 10L)
    }
    // case-insensitive internal-name collision
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(Seq((1L, 2L)).toDF("p", "_BIN"),
        Seq((0L, 10L)).toDF("lo", "hi"), col("p"), col("lo"), col("hi"), 10L)
    }
    // shared user column name across the two inputs
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(Seq((1L, 1L)).toDF("p", "id"),
        Seq((1L, 0L, 10L)).toDF("id", "lo", "hi"), col("p"), col("lo"), col("hi"), 10L)
    }
    // an open-ended sentinel interval dies with the readable message,
    // not the executor's array-size limit
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(Seq(5L).toDF("p"),
        Seq((0L, Long.MaxValue)).toDF("lo", "hi"),
        col("p"), col("lo"), col("hi"), 10L).collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + chain(t.getCause)
    assert(chain(e).contains("raise binWidth"), s"wrong failure mode: ${chain(e)}")
  }

  test("intervalOverlap matches the plain theta-join spec on a dense sweep spanning zero") {
    // negative coordinates: the canonical-bin dedup rule relies on
    // truncating div being monotone on BOTH sides of zero
    val as = (-300L to 300L by 37L).map(lo => (s"a$lo", lo, lo + 45L))
    val bs = (-300L to 300L by 23L).map(lo => (s"b$lo", lo, lo + 11L))
    val got = RangeJoin.intervalOverlap(
        as.toDF("an", "alo", "ahi"), bs.toDF("bn", "blo", "bhi"),
        col("alo"), col("ahi"), col("blo"), col("bhi"), binWidth = 64L)
      .select("an", "bn").collect().map(r => (r.getString(0), r.getString(1)))
    val want = (for ((an, alo, ahi) <- as; (bn, blo, bhi) <- bs
      if alo < bhi && blo < ahi) yield (an, bn)).toSet
    assert(got.toSet == want && got.length == want.size)
  }

  test("matches the plain theta-join spec on a dense sweep") {
    val points = (0L to 400L by 7L).toSeq
    val ivs = Seq(("t1", 0L, 50L), ("t2", 49L, 51L), ("t3", 100L, 300L),
      ("t4", 399L, 400L), ("t5", 350L, 1000L))
    val got = join(points, ivs, w = 64L)
    val want = (for (p <- points; (n, lo, hi) <- ivs if p >= lo && p < hi)
      yield (p, n)).toSet
    assert(got == want)
  }
}
