package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line on stdout for the driver.
  *
  * Measurement notes (VERDICT r1 "What's wrong" #1/#7):
  *  - each query is materialized with a `noop` write, which evaluates EVERY
  *    output column — `.count()` let Catalyst prune the very window columns
  *    a query exists to compute;
  *  - one untimed warmup query runs first so JVM/Spark startup cost does not
  *    land on whichever query happens to be first in map order;
  *  - a failing query is NOT swallowed to a fast `-1`: it records -1 AND the
  *    error string, and the process exits non-zero after still printing the
  *    JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // InferFiltersFromGenerate inlines a computed explode input into a
      // size()>0 filter BELOW the projection, re-evaluating the whole
      // array expression ~8x per row (ta_decontam: 86s -> 1s without it);
      // the inferred filter is defensive only - explode of an empty
      // array already emits nothing.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Warmup: exercise scan + shuffle + codegen paths once, untimed.
    try materialize("q1_lineitem_agg") catch { case _: Throwable => () }

    // Dev-only: SPARK_GRAFT_ONLY=q1,q2 times a subset while iterating on
    // one operator; the driver never sets it, so the round bench is full.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    var errors = List.empty[String]
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val results = names.map { name =>
      def once(): Double = {
        val t0 = System.nanoTime()
        materialize(name)
        (System.nanoTime() - t0) / 1e9
      }
      try {
        // min-of-2 to damp transient machine noise; queries already past
        // 20 s run once so the second pass never doubles the long tail.
        val first = once()
        name -> (if (first < 20.0) math.min(first, once()) else first)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        errors ::= name
        name -> -1.0
      }
    }
    // The driver captures only the LAST ~2000 chars of stdout and parses the
    // JSON line out of that tail. Round 4's line (62 queries at full double
    // precision) overflowed the window and recorded `parsed: null`, so keep
    // this line compact: 2-dp per-query seconds (the gate reads `value`;
    // per-query entries are diagnostic), errors only when non-empty,
    // basename-only sf. ~74 queries ≈ 1.77 KB.
    def fmt(v: Double, dp: Int): String =
      BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble.toString
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val errJson =
      if (errors.isEmpty) ""
      else errors.map("\"" + _ + "\"").mkString(""","errors":[""", ",", "]")
    val sfName = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    def line(dp: Int): String = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v, dp) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec","queries":$qs$errJson,"sf":"$sfName"}"""
    }
    // self-guard: if the query map grows past the tail window at 2 dp,
    // degrade per-query precision rather than lose the parse again
    val out = Seq(2, 1, 0).iterator.map(line).find(_.length <= 1850)
      .getOrElse(line(0))
    println(out)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
