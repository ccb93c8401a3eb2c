package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling, TextAnalysis}

/** Dev tool (VERDICT r14 #4): phase-timed rebuild of e4_curation_full so
  * the <6 s solo chase is driven by measured stage attribution instead of
  * guesswork. Mirrors SparkEntry's e4 structure exactly (including the
  * r14 exact-canonical-first staging), forcing each checkpointed stage
  * with a count and printing per-phase wall time. A second rep separates
  * cold-JIT/codegen cost from steady-state work.
  *
  * Usage (same classpath as scripts/solo_bench.py):
  *   java ... graft.E4Profile [sfDir] [reps]
  */
object E4Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(1)
    // mirror Bench's session exactly (nanosAsLong + the excluded
    // InferFiltersFromGenerate rule) so phase timings attribute the same
    // plans the official bench runs
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
    val Cfg = PipelineConfig.Default

    for (rep <- 1 to reps) {
      def t[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"rep$rep phase $name%-28s ${(System.nanoTime() - t0) / 1e6}%9.0f ms")
        r
      }

      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val corpus = d.unionByName(d.withColumn("doc_id", col("doc_id") + 1000000))

      val ex = corpus.select(col("doc_id"), md5(col("text")).as("__h"))
      val em = ex.join(
          ex.groupBy(col("__h")).agg(min(col("doc_id")).as("cid")), Seq("__h"))
        .select(col("doc_id"), col("cid"))
        .localCheckpoint(eager = false)
      t("exact_map") { em.count() }
      val canonDocs = corpus.join(
        em.filter(col("doc_id") === col("cid")).select("doc_id"), Seq("doc_id"))
      val copyEdges = em.filter(col("doc_id") =!= col("cid"))
        .select(col("cid").as("doc_a"), col("doc_id").as("doc_b"))

      val sig = Dedup.signatures(canonDocs, "doc_id", "text", Cfg.nSig)
        .localCheckpoint(eager = false)
      t("sig_checkpoint") { sig.count() }

      val pairs = Dedup.minhashPairs(canonDocs, "doc_id", "text",
          numBands = Cfg.numBands, rowsPerBand = Cfg.rowsPerBand,
          threshold = Cfg.nearDupThreshold, maxBucket = Cfg.maxBucket,
          sigs = Some(sig))
        .select(col("doc_a"), col("doc_b"))
        .localCheckpoint(eager = false)
      t("minhash_pairs") { pairs.count() }

      val contain = Dedup.containmentPairs(s, canonDocs, "doc_id", "text",
          Cfg.containmentDfCap, Cfg.containmentThreshold)
        .select(col("doc_a"), col("doc_b"))
        .localCheckpoint(eager = false)
      t("containment_pairs") { contain.count() }

      val edges = pairs.unionByName(contain).unionByName(copyEdges)
      val clusters = t("clusters_closure") {
        val c = Dedup.duplicateClusters(corpus.select(col("doc_id").as("id")), edges)
          .localCheckpoint(eager = false)
        c.count(); c
      }

      val canonical = corpus.join(
        clusters.filter(col("id") === col("label"))
          .select(col("id").as("doc_id")), Seq("doc_id"))
        .localCheckpoint(eager = false)
      t("canonical_checkpoint") { canonical.count() }

      val sh = canonical
        .select(col("doc_id"), Dedup.tokenValues(col("text")).as("tv"))
        .select(col("doc_id"), Dedup.shingleValuesFromTokens(col("tv")).as("sh"))
      val benchG = Tables.documents(s, dir).filter(col("doc_id") < 20)
        .select(Dedup.tokenValues(col("text")).as("tv"))
        .select(Dedup.shingleValuesFromTokens(col("tv")).as("sh"))
        .select(explode(col("sh")).as("g")).distinct()
      val contaminated = sh.select(col("doc_id"), explode(col("sh")).as("g"))
        .join(broadcast(benchG), Seq("g"))
        .select("doc_id").distinct()
        .localCheckpoint(eager = false)
      t("decontam_ids") { contaminated.count() }

      val q = TextAnalysis.qualityColumns(col("text")).toMap
      val out = canonical.join(contaminated, Seq("doc_id"), "left_anti")
        .join(Tables.documents(s, dir)
            .select(col("doc_id").as("orig_id"), col("lang")),
          pmod(col("doc_id"), lit(1000000L)) === col("orig_id"))
        .filter(Sampling.deterministicKeep(col("doc_id"), 50))
        .select(col("doc_id"), col("lang"), q("quality").as("quality"),
          TextAnalysis.whitespaceTokenCount(col("text")).as("ws_tokens"))
        .filter(col("quality") >= Cfg.qualityMin)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ws_tokens")).cast("long").as("total_tokens"))
      t("quality_tail") { out.collect() }
      // drop this rep's checkpoint blocks so rep2 measures work, not
      // cache-pressure from rep1
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    s.stop()
  }
}
