package graft

import org.apache.spark.sql.functions._
import graft.operators.{Stats, TextAnalysis}
import graft.streaming.StreamingAlerts

/** Guard-branch specs for the round-7 additions: the null-pair moment
  * guard and σ=0 / NaN clamps in [[Stats]], the progressive PII counting
  * contract in [[TextAnalysis]], and the baseline recurrence of
  * [[StreamingAlerts.thresholdAlertsScan]] — branches the null-free
  * sf0.01 driver data never reaches.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("corrExact: only complete pairs feed the moments; incomplete rows shift nothing") {
    val df = Seq(
      ("a", Some(1L), Some(2L)), ("a", Some(2L), Some(4L)), ("a", Some(3L), Some(6L)),
      ("a", None: Option[Long], Some(5L)),   // y without x: must not shift sy
      ("a", Some(7L), None: Option[Long])    // x without y: must not shift sx
    ).toDF("g", "x", "y")
    val out = Stats.corrExact(df, Seq("g"), col("x"), col("y")).collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 3L)          // n = complete pairs only
    assert(out(0).getDouble(2) == 1.0)       // y = 2x exactly on those pairs
  }

  test("corrExact: zero-variance side yields null corr (0/0 via try_divide)") {
    val df = Seq(("z", Some(5L), Some(1L)), ("z", Some(5L), Some(2L)))
      .toDF("g", "x", "y")
    val out = Stats.corrExact(df, Seq("g"), col("x"), col("y")).collect()
    assert(out(0).getLong(1) == 2L && out(0).isNullAt(2))
  }

  test("corrExact: a group with zero complete pairs still surfaces as (n=0, null)") {
    val df = Seq(
      ("ok", Some(1L), Some(1L)), ("ok", Some(2L), Some(3L)),
      ("empty", None: Option[Long], Some(9L)),
      ("empty", Some(4L), None: Option[Long])
    ).toDF("g", "x", "y")
    val out = Stats.corrExact(df, Seq("g"), col("x"), col("y"))
      .orderBy("g").collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "empty" && out(0).getLong(1) == 0L && out(0).isNullAt(2))
    assert(out(1).getString(0) == "ok" && out(1).getLong(1) == 2L)
  }

  test("rollingCorr: trailing RANGE frame folds exact moments; bucket gaps break the frame") {
    val df = Seq(
      // bucket 1: y = 2x exactly
      ("a", 1L, Some(1L), Some(2L)), ("a", 1L, Some(2L), Some(4L)),
      // bucket 2: adds (3,5) — frame {1,2} has x=[1,2,3], y=[2,4,5]
      ("a", 2L, Some(3L), Some(5L)),
      // bucket 3: adds (5,1) — frame {2,3} is two points, x up y down
      ("a", 3L, Some(5L), Some(1L)),
      // incomplete pair in bucket 3: must shift no frame moment
      ("a", 3L, None: Option[Long], Some(99L)),
      // bucket 30: gap > lookback — RANGE isolates it (ROWS would not);
      // single pair → zero variance → null corr
      ("a", 30L, Some(4L), Some(7L))
    ).toDF("g", "b", "x", "y")
    val out = Stats.rollingCorr(df, "g", "b", col("x"), col("y"), lookback = 1)
      .orderBy("b").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L), (2L, 3L), (3L, 2L), (30L, 1L)))
    assert(out(0).getDouble(3) == 1.0)
    // n=3: cov=3·25−6·11=9, varx=3·14−36=6, vary=3·45−121=14 → 9/√84
    assert(out(1).getDouble(3) == 0.981981)
    assert(out(2).getDouble(3) == -1.0)
    assert(out(3).isNullAt(3))
  }

  test("zscoreTopK: σ=0 and null-x rows get null z and sort below every scored row") {
    val df = Seq(
      ("a", 1L, Some(0L)), ("a", 2L, Some(10L)), ("a", 3L, Some(20L)),
      ("a", 4L, None: Option[Long]),           // null x: null z, not in top
      ("b", 5L, Some(5L)), ("b", 6L, Some(5L)) // σ=0 group: null z for all
    ).toDF("g", "id", "x")
    val out = Stats.zscoreTopK(df, Seq("g"), col("x"),
      keep = Seq("id"), k = 10, tiebreak = "id").collect()
    assert(out.length == 6)
    // |z|: id1 = id3 = 1.2247 (tie -> id asc), id2 = 0, then null-z rows id asc
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L, 4L, 5L, 6L))
    assert(out(0).getDouble(3) == -1.2247 && out(1).getDouble(3) == 1.2247)
    assert(out.drop(3).forall(_.isNullAt(3))) // no NaN squatting in the top-k
  }

  test("piiCounts: a phone-shaped run inside an email local part counts as email, not phone") {
    val df = Seq(
      ("user+555-123-4567@ex.com ok", 1),  // '+' puts a \b before 555
      ("call 555-123-4567 now", 2),
      ("from 999.1.2.3 and 10.2.0.1", 3)   // 999.* is not an address
    ).toDF("text", "id")
    val out = df.select(col("id") +:
        (TextAnalysis.piiCounts(col("text")).map { case (n, c) => c.as(n) } :+
          TextAnalysis.piiRedact(col("text")).as("red")): _*)
      .orderBy("id").collect()
    assert(out(0).getInt(1) == 1 && out(0).getInt(2) == 0)  // email, NO phone
    assert(out(0).getString(4) == "<EMAIL> ok")
    assert(out(1).getInt(1) == 0 && out(1).getInt(2) == 1)  // plain phone still counts
    assert(out(2).getInt(3) == 1)                           // only the in-range IPv4
    assert(out(2).getString(4) == "from 999.1.2.3 and <IPV4>")
  }

  test("thresholdAlertsScan: baseline re-anchors on each alert; first tick arms silently") {
    def t(id: Long, v: Double) = StreamingAlerts.IdTick(
      "k", id, new java.sql.Timestamp(id * 1000L), v)
    val ds = Seq(t(1, 100.0), t(2, 200.0), t(3, 40.0), t(4, 41.0), t(5, 100.0)).toDS()
    val out = StreamingAlerts.thresholdAlertsScan(ds, 50.0)
      .orderBy("event_id").collect()
    // 100 arms; 200 alerts off 100; 40 alerts off 200; 41 is +2.5% (silent);
    // 100 alerts off 40
    assert(out.map(a => (a.event_id, a.baseline)).toSeq ==
      Seq((2L, 100.0), (3L, 200.0), (5L, 40.0)))
    assert(out(0).move_pct == 100.0 && out(1).move_pct == -80.0)
  }

  test("thresholdAlertsScan: a key whose every tick alerts emits every tick after the first") {
    def t(id: Long, v: Double) = StreamingAlerts.IdTick(
      "hot", id, new java.sql.Timestamp(id * 1000L), v)
    val ds = Seq(t(1, 1.0), t(2, 10.0), t(3, 100.0), t(4, 1000.0)).toDS()
    val out = StreamingAlerts.thresholdAlertsScan(ds, 50.0).collect()
    assert(out.map(_.event_id).sorted.toSeq == Seq(2L, 3L, 4L))
  }
}
