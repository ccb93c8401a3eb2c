package graft

import scala.collection.mutable
import org.apache.spark.sql.functions._
import graft.operators.{Sentiment, SentimentInference}
import graft.sources.Resilience

/** M2/M3 — retry schedule, rate-limit pacing, and their wiring through
  * the batched-inference seam (the boundary retry.py:11-44 and
  * news.py:128 decorate in the reference).
  */
class ResilienceSpec extends SparkSpec {
  import spark.implicits._

  private final class RecordingSleeper extends Resilience.Sleeper {
    val sleeps: mutable.Buffer[Long] = mutable.Buffer.empty
    def sleep(millis: Long): Unit = sleeps += millis
  }

  test("M2: default policy is the reference schedule (3 retries, 2s, x2)") {
    val p = Resilience.RetryPolicy()
    assert((0 until 3).map(p.delayMillis) == Seq(2000L, 4000L, 8000L))
  }

  test("M2: success after transient failures — sleeps follow the backoff") {
    val sleeper = new RecordingSleeper
    var calls = 0
    val out = Resilience.withRetry(Resilience.RetryPolicy(), sleeper) {
      calls += 1
      if (calls < 3) throw new RuntimeException(s"transient $calls")
      "ok"
    }
    assert(out == "ok" && calls == 3)
    assert(sleeper.sleeps.toSeq == Seq(2000L, 4000L))
  }

  test("M2: exhausted retries rethrow the LAST failure") {
    val sleeper = new RecordingSleeper
    var calls = 0
    val e = intercept[RuntimeException] {
      Resilience.withRetry(Resilience.RetryPolicy(), sleeper) {
        calls += 1
        throw new RuntimeException(s"fail $calls")
      }
    }
    assert(e.getMessage == "fail 4") // 1 try + 3 retries
    assert(sleeper.sleeps.toSeq == Seq(2000L, 4000L, 8000L))
  }

  test("M2: fatal errors propagate immediately, no retry") {
    val sleeper = new RecordingSleeper
    var calls = 0
    intercept[InterruptedException] {
      Resilience.withRetry(Resilience.RetryPolicy(), sleeper) {
        calls += 1
        throw new InterruptedException("fatal-class")
      }
    }
    assert(calls == 1 && sleeper.sleeps.isEmpty)
  }

  test("M3: rate limiter enforces the min interval from slot boundaries") {
    val sleeps = mutable.Buffer.empty[Long]
    var now = 1000L
    val rl = new Resilience.RateLimiter(1000L, () => now,
      (ms: Long) => { sleeps += ms; now += ms })
    rl.acquire() // first call never waits (news.py sleeps before EVERY
                 // call; min-interval pacing skips the pointless first one)
    rl.acquire() // back-to-back: full interval
    now += 250
    rl.acquire() // 250ms elapsed since slot: tops up to the slot, not +1000
    now += 5000
    rl.acquire() // long gap: no sleep, schedule resets to now
    assert(sleeps.toSeq == Seq(1000L, 750L))
    rl.acquire() // after the reset: one full interval again
    assert(sleeps.toSeq == Seq(1000L, 750L, 1000L))
  }

  test("M3: zero interval is a no-op") {
    val rl = new Resilience.RateLimiter(0L,
      () => throw new IllegalStateException("clock must not be read"),
      (_: Long) => throw new IllegalStateException("must not sleep"))
    rl.acquire(); rl.acquire()
  }

  private val seamRows = Seq[(Long, String)](
    (0L, "No major headline available"),
    (1L, "fast fast slow gains"),
    (2L, "big big slow crash"),
    (3L, "no lexicon words here"))

  import ResilienceSpec.FlakyLexicon

  test("M2+M1: seam retry recovers a transient provider failure in-task") {
    val df = seamRows.toDF("doc_id", "headline")
    val expected = Sentiment.withAnalysis(df, "headline", "s")
      .select(col("doc_id"), col("s.label"), col("s.score"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val got = SentimentInference.withBatchedAnalysis(
        df.repartition(2), "doc_id", "headline",
        ResilienceSpec.flakyFactory(1), batchSize = 2,
        retry = Some(Resilience.RetryPolicy(maxRetries = 1, initialDelayMillis = 1L)),
        minCallIntervalMillis = 1L)
      .select(col("doc_id"), col("label"), col("score"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == expected)
  }

  test("M2+M1: exhausted in-task retries fail the task (not silent data loss)") {
    val df = seamRows.toDF("doc_id", "headline")
    val e = intercept[Exception] {
      SentimentInference.withBatchedAnalysis(
          df.repartition(1), "doc_id", "headline",
          ResilienceSpec.flakyFactory(100), batchSize = 2,
          retry = Some(Resilience.RetryPolicy(maxRetries = 1, initialDelayMillis = 1L)))
        .count()
    }
    assert(e.getMessage.contains("transient") ||
      Option(e.getCause).exists(_.getMessage.contains("transient")))
  }

  // --- M2 at the SCAN boundary (market.py:26,84 parity): every
  // Tables.apply acquisition runs through the withRetry seam; default
  // policy is zero retries (identity), a flaky double exercises
  // recovery and exhaustion. Restores the shared seam in finally (the
  // session — and Tables' globals — are shared across suites).

  test("M2 scan seam: transient acquisition failures recover on the backoff schedule") {
    val realAcquire = Tables.acquire
    val (realPolicy, realSleeper) = (Tables.scanRetry, Tables.scanSleeper)
    val sleeper = new RecordingSleeper
    var calls = 0
    try {
      Tables.acquire = (s, dir, name) => {
        calls += 1
        if (calls < 3) throw new RuntimeException(s"transient listing failure $calls")
        realAcquire(s, dir, name)
      }
      Tables.scanRetry = Resilience.RetryPolicy() // the reference's 3x/2s/x2
      Tables.scanSleeper = sleeper
      val n = Tables.documents(spark, "/root/testdata/sf0.001").count()
      assert(n > 0 && calls == 3)
      assert(sleeper.sleeps.toSeq == Seq(2000L, 4000L))
    } finally {
      Tables.acquire = realAcquire
      Tables.scanRetry = realPolicy
      Tables.scanSleeper = realSleeper
    }
  }

  test("M2 scan seam: exhausted retries rethrow the last acquisition failure") {
    val realAcquire = Tables.acquire
    val (realPolicy, realSleeper) = (Tables.scanRetry, Tables.scanSleeper)
    val sleeper = new RecordingSleeper
    var calls = 0
    try {
      Tables.acquire = (_, _, _) => {
        calls += 1
        throw new RuntimeException(s"transient listing failure $calls")
      }
      Tables.scanRetry = Resilience.RetryPolicy()
      Tables.scanSleeper = sleeper
      val e = intercept[RuntimeException] {
        Tables.documents(spark, "/root/testdata/sf0.001")
      }
      assert(e.getMessage == "transient listing failure 4") // initial + 3 retries
      assert(sleeper.sleeps.toSeq == Seq(2000L, 4000L, 8000L))
    } finally {
      Tables.acquire = realAcquire
      Tables.scanRetry = realPolicy
      Tables.scanSleeper = realSleeper
    }
  }

  test("M2 scan seam: default policy is pass-through — first failure propagates, no sleeps") {
    val realAcquire = Tables.acquire
    val sleeper = new RecordingSleeper
    val realSleeper = Tables.scanSleeper
    try {
      Tables.acquire = (_, _, _) => throw new RuntimeException("hard failure")
      Tables.scanSleeper = sleeper
      val e = intercept[RuntimeException] {
        Tables.documents(spark, "/root/testdata/sf0.001")
      }
      assert(e.getMessage == "hard failure")
      assert(sleeper.sleeps.isEmpty)
    } finally {
      Tables.acquire = realAcquire
      Tables.scanSleeper = realSleeper
    }
  }
}

object ResilienceSpec {
  /** Lexicon semantics, but the first `failures` scoreBatch calls of
    * each partition-local instance throw — retry must re-invoke and get
    * the same answer. Top-level so the factory closure captures no
    * (non-serializable) spec instance.
    */
  final class FlakyLexicon(failures: Int)
      extends SentimentInference.SentimentModel {
    private val inner = new SentimentInference.LexiconModel
    private var remaining = failures
    def scoreBatch(hs: Seq[String]): Seq[(String, Double)] = {
      if (remaining > 0) { remaining -= 1; throw new RuntimeException("transient") }
      inner.scoreBatch(hs)
    }
  }

  def flakyFactory(failures: Int): () => SentimentInference.SentimentModel =
    () => new FlakyLexicon(failures)
}
