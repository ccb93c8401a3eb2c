package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev tool: phase-timed rebuild of sim_ivfpq_ann so its solo cost is
  * attributed to training vs encode vs probe instead of guessed (the
  * E4Profile pattern). Mirrors the SparkEntry query exactly.
  *
  * Usage (same classpath as scripts/solo_bench.py):
  *   java ... graft.IvfPqProfile [sfDir] [reps]
  */
object IvfPqProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(1)
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
    import s.implicits._

    for (rep <- 1 to reps) {
      def t[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"rep$rep phase $name%-24s ${(System.nanoTime() - t0) / 1e6}%9.0f ms")
        r
      }
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val (codebook, cw) = t("train-concurrent") {
        Similarity.trainIvfPqConcurrently(emb, coarseK = 8,
          iters = Cfg.kmeansIters, trainBound = Cfg.pqTrainBound,
          m = Cfg.pqM, subDim = Cfg.pqSubDim, codewords = Cfg.pqCodewords)
      }
      t("search") {
        Similarity.topKIvfPq(emb.filter(col("id") < 5), emb, cw,
            k = Cfg.pqK, m = Cfg.pqM, subDim = Cfg.pqSubDim,
            rerank = Cfg.pqRerank, centroids = codebook, nProbe = 2)
          .write.format("noop").mode("overwrite").save()
      }
      t("brute") {
        Similarity.topKBrute(emb.filter(col("id") < 5), emb, Cfg.pqK)
          .write.format("noop").mode("overwrite").save()
      }
    }
    s.stop()
  }
}
