package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed physical plan for the named queries.
  *
  * Usage: `sbt "runMain graft.PlanDump <sfDir> <query> [query ...]"` or via
  * `java -cp target/scala-2.13/classes:...` like scripts/solo_bench.py.
  * With `SPARK_GRAFT_PLAN_RUN=1` each query is also executed (noop write)
  * and the FINAL adaptive plan is printed — the only way to see
  * AQE-finalized broadcast decisions.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- names) {
      println(s"===== $q")
      val df = SparkEntry.queries(q)(spark, sfDir)
      if (sys.env.contains("SPARK_GRAFT_PLAN_RUN")) {
        df.write.format("noop").mode("overwrite").save()
      }
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
