package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (VERDICT r13 #5): sweep PQ (codewords × rerank) and print the
  * mean recall@3 against the brute-cosine truth, so the Cfg defaults are
  * CHOSEN from a measurement instead of guessed.
  *
  * Usage: like scripts/solo_bench.py's java invocation:
  *   java ... graft.PqSweep <sfDir> [cw,cw,...] [rr,rr,...]
  */
object PqSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cws = args.lift(1).map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(16, 32))
    val rrs = args.lift(2).map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(10, 15, 25))
    val cfg = PipelineConfig.Default
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = emb.filter(col("id") < 5)
    val brute = operators.Similarity.topKBrute(q, emb, 3)
      .select(col("q_id"), col("c_id")).cache()
    brute.count()
    for (cw <- cws) {
      val t0 = System.nanoTime()
      val cwBlocks = operators.Similarity.trainPqCodebooks(
          emb.filter(col("id") < cfg.pqTrainBound), "id", "vec",
          m = cfg.pqM, subDim = cfg.pqSubDim, k = cw, iters = cfg.kmeansIters)
        .toDF("m", "cwid", "cwblk").cache()
      cwBlocks.count()
      val trainMs = (System.nanoTime() - t0) / 1e6
      for (rr <- rrs) {
        val t1 = System.nanoTime()
        val pq = operators.Similarity.topKPqBlocks(q, emb, cwBlocks, k = 3,
            m = cfg.pqM, subDim = cfg.pqSubDim, rerank = rr)
          .select(col("q_id"), col("c_id"), lit(1).as("__hit"))
        val rec = brute.join(pq, Seq("q_id", "c_id"), "left")
          .agg((count(col("__hit")).cast("double") / count(lit(1))).as("recall"))
          .collect()(0).getDouble(0)
        val searchMs = (System.nanoTime() - t1) / 1e6
        println(f"cw=$cw%2d rerank=$rr%2d recall=$rec%.4f train_ms=$trainMs%.0f search_ms=$searchMs%.0f")
      }
      cwBlocks.unpersist()
    }
    spark.stop()
  }
}
