package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided star-schema parquet tables
  * (`/root/testdata/sf*`, see TESTDATA.md). All schemas are declared by the
  * parquet footers; we never infer from CSV (SURVEY.md §1.3).
  *
  * At cluster scale the same entry points would read a partitioned table
  * root (e.g. `.../lineitem/` bucketed by join key); the single-file layout
  * here is the local-mode shadow of that.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    * default. With `spark.sql.legacy.parquet.nanosAsLong=true` (set by every
    * session builder in this repo — Verify, Bench, the test fixture — NOT
    * mutated here; a loader must not have session-global side effects) the
    * column arrives as a long, and we rebuild a microsecond TimestampType —
    * the generator emits µs-clean values, so `div 1000` is lossless and
    * matches DuckDB's ns→µs view of the data.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))

  /** Events restricted to a recency window, with the predicate applied on
    * the RAW nanos column BEFORE the timestamp rebuild — a filter on the
    * derived `timestamp_micros(...)` column cannot push into the parquet
    * scan (observed: only IsNotNull pushed), which at 100 TB means a
    * full-history read for a 72-hour window. Here the scan shows
    * `PushedFilters: [GreaterThanOrEqual(ts,...), LessThanOrEqual(ts,...)]`
    * and row groups outside the window never leave disk.
    * `asOf` is UTC (session timezone), inclusive on both ends — identical
    * semantics to [[graft.operators.Recency.recencyWindow]].
    */
  def eventsInWindow(spark: SparkSession, dir: String,
      asOf: String, lookbackHours: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val hiNanos = java.time.LocalDateTime
      .parse(asOf.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC)
      .toEpochMilli * 1000000L
    val loNanos = hiNanos - lookbackHours * 3600L * 1000000000L
    apply(spark, dir, "events")
      .filter(col("ts") >= loNanos && col("ts") <= hiNanos)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
