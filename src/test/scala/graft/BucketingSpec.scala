package graft

/** Bucketing = the pre-shuffle: two tables bucketed the same way on the
  * join key sort-merge-join with NO exchange on either side. At 100 TB
  * this is the difference between re-shuffling the fact table on every
  * join and paying the partitioning once at write time (SURVEY.md §4
  * physical-execution notes).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables sort-merge join with zero shuffle") {
    val df = (1 to 1000).map(i => (i % 50, i, i * 1.5)).toDF("k", "id", "v")
    df.write.format("parquet").bucketBy(8, "k").sortBy("k")
      .mode("overwrite").saveAsTable("bucketed_a")
    df.write.format("parquet").bucketBy(8, "k").sortBy("k")
      .mode("overwrite").saveAsTable("bucketed_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bucketed_a")
        .join(spark.table("bucketed_b"), "k")
      assert(joined.count() == 20000L) // 50 keys x 20 x 20
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
    }
  }

  test("co-bucketed tables feed the as-of merge with zero exchanges") {
    import org.apache.spark.sql.functions._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // bucket count MUST equal shuffle partitions: the merge exec demands
    // exact StatefulOpClusteredDistribution co-partitioning
    Seq((1L, ts("2024-01-10 00:00:00"), 1.0), (2L, ts("2024-01-10 00:00:00"), 2.0))
      .toDF("k", "t", "lv")
      .write.format("parquet").bucketBy(2, "k").sortBy("k", "t")
      .mode("overwrite").saveAsTable("asof_l")
    Seq((1L, ts("2024-01-08 00:00:00"), 10.0), (2L, ts("2024-01-01 00:00:00"), 20.0))
      .toDF("rk", "rt", "rv")
      .write.format("parquet").bucketBy(2, "rk").sortBy("rk", "rt")
      .mode("overwrite").saveAsTable("asof_r")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // pin the merge path
    try {
      val j = graft.operators.AsOf.asOfJoin(
        spark.table("asof_l"), spark.table("asof_r"),
        "k", "rk", "t", "rt", java.time.Duration.ofDays(7))
      val out = j.collect().map(r => r.getLong(0) -> Option(r.get(5))).toMap
      assert(out == Map(1L -> Some(10.0), 2L -> None)) // 9-day gap > tolerance
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("AsOfJoin"))
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed as-of must not shuffle:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS asof_l")
      spark.sql("DROP TABLE IF EXISTS asof_r")
    }
  }

  test("partitioned layout: a date predicate prunes partitions at planning time") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val df = (1 to 300).map(i => (s"2024-01-${i % 3 + 10}", i.toLong, i * 1.0))
      .toDF("dt", "id", "v")
    // partitionBy at write = the physical layout a 100 TB fact table
    // ships with; a filter on the partition column then never touches
    // the other directories' files (pruning is metadata-only)
    df.write.partitionBy("dt").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("dt") === "2024-01-11")
    assert(q.count() == 100L)
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters: [") &&
      scan.contains("dt#") && !scan.contains("PartitionFilters: []"),
      s"date filter did not reach PartitionFilters:\n$scan")
    // and the pruned scan reads 1 of 3 directories
    val selected = q.queryExecution.executedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]
      .selectedPartitions.partitionCount
    assert(selected == 1, s"expected 1 partition, got $selected")
  }

  test("a non-bucketed copy of the same join DOES shuffle (the baseline)") {
    val df = (1 to 1000).map(i => (i % 50, i, i * 1.5)).toDF("k", "id", "v")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = df.join(df.select($"k", $"id".as("id2")), "k")
      joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange hashpartitioning"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
