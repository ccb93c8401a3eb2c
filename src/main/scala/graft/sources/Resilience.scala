package graft.sources

import scala.util.control.NonFatal

/** M2/M3 — connector-boundary resilience: retry with exponential backoff
  * and rate-limit pacing for external calls.
  *
  * Reference behavior: a retry decorator with 3 retries, 2 s initial
  * delay, ×2 backoff (src/core/retry.py:11-44, applied at
  * src/providers/market.py:26,84), and an unconditional 1 s sleep before
  * each news API call (src/providers/news.py:128).
  *
  * Spark placement: these are NOT plan nodes. Infra failures inside a
  * task are already covered by Spark's own task retry
  * (`spark.task.maxFailures`); what that cannot express is a polite
  * retry/pace loop around an external service called from WITHIN a
  * healthy task (failing the whole task to retry one API call would
  * recompute the partition). So both live at the call site:
  * [[Resilience.withRetry]] wraps a single external call, and
  * [[Resilience.RateLimiter]] paces successive calls from one partition.
  * [[graft.operators.SentimentInference.withBatchedAnalysis]] threads
  * both around its per-batch model invocation — the same boundary the
  * reference decorates.
  *
  * 100 TB note: a per-PARTITION limiter bounds each task's call rate;
  * the cluster-wide rate is (partitions in flight × per-partition
  * rate), so the caller sizes `repartition(n)` on the inference stage
  * to hit a global budget — there is deliberately no shared-state
  * global limiter (a driver-coordinated token bucket would serialize
  * every executor call through one lock).
  */
object Resilience {

  /** Injected sleep so specs assert the exact delay schedule without
    * wall-clock waits. SAM-convertible: `(ms: Long) => ()`.
    */
  trait Sleeper extends Serializable { def sleep(millis: Long): Unit }

  /** Real thread sleep, used on executors. */
  object SystemSleeper extends Sleeper {
    def sleep(millis: Long): Unit = if (millis > 0) Thread.sleep(millis)
  }

  /** Retry schedule mirroring retry.py:11-44: `maxRetries` re-attempts
    * after the first failure, delays `initialDelayMillis × factor^k`.
    * Defaults are the reference's (3 retries, 2 s, ×2 → waits of
    * 2 s, 4 s, 8 s).
    */
  final case class RetryPolicy(
      maxRetries: Int = 3,
      initialDelayMillis: Long = 2000L,
      backoffFactor: Double = 2.0) {
    require(maxRetries >= 0, s"maxRetries must be >= 0, got $maxRetries")
    require(initialDelayMillis >= 0,
      s"initialDelayMillis must be >= 0, got $initialDelayMillis")
    require(backoffFactor >= 1.0,
      s"backoffFactor must be >= 1.0, got $backoffFactor")

    /** Delay before re-attempt k (0-based). */
    def delayMillis(k: Int): Long =
      (initialDelayMillis * math.pow(backoffFactor, k.toDouble)).toLong
  }

  /** Run `f`, retrying on non-fatal failure per `policy`. Rethrows the
    * LAST failure once retries are exhausted (retry.py:41-44 re-raises
    * the final exception; earlier ones are only logged there, dropped
    * here). Fatal errors (OOM etc.) propagate immediately — retrying a
    * JVM in a fatal state only delays the inevitable task failure.
    */
  def withRetry[T](policy: RetryPolicy,
      sleeper: Sleeper = SystemSleeper)(f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case NonFatal(e) if attempt < policy.maxRetries =>
          sleeper.sleep(policy.delayMillis(attempt))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Paces successive `acquire()` calls at least `minIntervalMillis`
    * apart. The reference sleeps a flat 1 s BEFORE every call
    * (news.py:128) even when the previous call itself took longer; a
    * min-interval limiter keeps the same worst-case request rate while
    * not stacking sleep on top of slow calls. `minIntervalMillis = 0`
    * is a no-op. One instance per partition (it is mutable and
    * synchronized, not shared across tasks).
    */
  final class RateLimiter(
      minIntervalMillis: Long,
      clock: () => Long = () => System.nanoTime() / 1000000L,
      sleeper: Sleeper = SystemSleeper) extends Serializable {
    require(minIntervalMillis >= 0,
      s"minIntervalMillis must be >= 0, got $minIntervalMillis")
    private[this] var lastMillis = Long.MinValue

    def acquire(): Unit = if (minIntervalMillis > 0) synchronized {
      val now = clock()
      if (lastMillis != Long.MinValue) {
        val wait = lastMillis + minIntervalMillis - now
        if (wait > 0) sleeper.sleep(wait)
      }
      // schedule from the intended slot, not the post-sleep clock: a
      // coarse sleeper that overshoots must not push every later slot
      lastMillis = math.max(now, lastMillis + minIntervalMillis)
    }
  }
}
