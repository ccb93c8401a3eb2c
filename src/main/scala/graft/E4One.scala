package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time the real SparkEntry query (default e4_curation_full) as
  * ONE action in a fresh JVM — the cold-JIT/single-DAG counterpart of
  * [[E4Profile]]'s phased timings.
  */
object E4One {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("e4_curation_full")
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    // mirror Bench's session exactly — the excluded InferFiltersFromGenerate
    // rule in particular (without it, explode of a computed shingle array
    // re-evaluates the tokenize+md5 transform per inferred filter)
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    if (sys.env.contains("GRAFT_JOB_DEBUG")) {
      import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
      val t0s = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
      s.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit =
          t0s(j.jobId) = (System.nanoTime(),
            Option(j.properties.getProperty("spark.job.description")).getOrElse("?").take(60))
        override def onJobEnd(j: SparkListenerJobEnd): Unit = t0s.remove(j.jobId).foreach {
          case (t0, desc) =>
            val ms = (System.nanoTime() - t0) / 1e6
            if (ms > 100) println(f"  job ${j.jobId}%3d $ms%7.0f ms  $desc")
        }
      })
    }
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(s, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"$name rep$i: ${(System.nanoTime() - t0) / 1e6}%9.0f ms")
      // Bench's cleanup(): checkpoint blocks must not bill to the next rep
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      s.catalog.clearCache()
    }
    s.stop()
  }
}
