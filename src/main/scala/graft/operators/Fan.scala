package graft.operators

import org.apache.spark.sql.DataFrame

/** Conditional fan-out for BYTE-LIGHT, CPU-DENSE stages (r21, guide
  * §2.5 "input skew: one huge unsplittable file … repartition
  * immediately after the read").
  *
  * Spark provisions parallelism by BYTES (`maxPartitionBytes` splits,
  * AQE coalesce targets) — the right heuristic for I/O-bound work, but
  * text/token kernels (per-token md5 shingling, PII regex chains,
  * payload block hashing) cost CPU per ROW at tiny bytes per row, so a
  * small input collapses them onto one or two cores: profiled at
  * sf0.1, the minhash map side ran 0.7 s of CPU in 2 tasks on a
  * 32-core box, st11's span kernel 1.6 s in ONE task. Round-robin
  * fanning such a frame out before the kernel spreads exactly that
  * compute; the exchange itself carries only the frame's few hundred
  * KB.
  *
  * Scale discipline: this is the IDENTITY whenever the input already
  * carries >= `target` partitions — at 100 TB every scan arrives in
  * hundreds of splits and no operator here ever adds an exchange (the
  * plan is unchanged; ExplainAuditSpec shapes at scale stay intact).
  * The fan-out only fires for inputs so small that Spark's byte
  * heuristics under-provision them, where an extra few-hundred-KB
  * round-robin exchange is free.
  *
  * The width cap bounds PER-TASK FIXED COST on tiny inputs: profiled
  * min-of-3 warm runs at sf0.1 read 1891 ms (cap 8) / 1970 ms (16) /
  * 2449 ms (32) for dedup_clusters — past ~8 tasks the fixed per-task
  * setup outweighs the spread compute at this input size. On a real
  * cluster the cap is irrelevant: the condition above already makes
  * the helper a no-op. Override with `spark.graft.fanout.cap`
  * (0 disables fan-out entirely).
  */
object Fan {
  val DefaultCap = 8

  def cap(df: DataFrame): Int =
    df.sparkSession.conf.getOption("spark.graft.fanout.cap")
      .map(_.toInt).getOrElse(DefaultCap)

  /** Fan `df` out to `min(defaultParallelism, cap)` partitions iff it
    * currently has fewer — identity on streaming frames (no .rdd) and
    * on any input already at or above the target.
    */
  def out(df: DataFrame): DataFrame = {
    if (df.isStreaming) df
    else {
      val c = cap(df)
      val target =
        math.min(df.sparkSession.sparkContext.defaultParallelism, c)
      if (target <= 1 || df.rdd.getNumPartitions >= target) df
      else df.repartition(target)
    }
  }

  /** [[out]] for POST-SHUFFLE frames, gated on a scan-side `gauge`:
    * `df.rdd` on an unexecuted aggregate reports the static
    * `spark.sql.shuffle.partitions` (AQE's runtime coalesce isn't
    * known at plan time), so the under-parallel condition must be read
    * off the frame whose partitioning IS known at plan time — the scan
    * feeding the chain. When the gauge scan is under-parallel (the
    * byte-light local case) AQE will also have coalesced the shuffle
    * to ~1 partition, so the post-shuffle kernel needs the same
    * spread; when the gauge carries >= target splits (any real corpus)
    * this is the identity.
    */
  def outLike(df: DataFrame, gauge: DataFrame): DataFrame = {
    if (df.isStreaming || gauge.isStreaming) df
    else {
      val c = cap(df)
      val target =
        math.min(df.sparkSession.sparkContext.defaultParallelism, c)
      if (target <= 1 || gauge.rdd.getNumPartitions >= target) df
      else df.repartition(target)
    }
  }
}
