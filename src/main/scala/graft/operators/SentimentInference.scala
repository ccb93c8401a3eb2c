package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-inference seam for M1 (reference: src/providers/sentiment.py):
  * the `mapPartitions` plumbing a REAL transformer (FinBERT via ONNX
  * Runtime / DJL) drops into, with the deterministic lexicon as the
  * sandbox model (no model weights or native inference runtime ship in
  * this container — see [[Sentiment]]'s header).
  *
  * What is real here and what is stubbed:
  *  - REAL: the provider contract ([[SentimentModel]] — lazy per-
  *    partition init like sentiment.py:100-102's lazy pipeline load,
  *    BATCHED scoring calls, close-with-partition lifecycle), the T13
  *    short-circuit BEFORE inference (structurally empty inputs never
  *    reach the model, sentiment.py:85-92), and the canonicalization /
  *    signed-normalization downstream of the raw model output
  *    (identical to [[Sentiment.analysisFromCounts]], so this operator
  *    and the expression scorer are interchangeable and share one
  *    oracle).
  *  - STUB: [[LexiconModel]] scores with the same word lists as the
  *    codegen'd expression path instead of running a transformer.
  *
  * Scale shape: one model handle per partition (not per row), fixed-size
  * batches amortize the per-call overhead a native runtime has, the
  * stage is a narrow zero-shuffle map, and upstream `repartition`
  * controls model-instance memory × parallelism. Prefer the expression
  * scorer ([[Sentiment.withAnalysis]]) when the model IS expressible as
  * expressions — it stays inside whole-stage codegen; this seam exists
  * for models that are not.
  */
object SentimentInference {

  /** The provider contract a real ONNX/DJL FinBERT implements: batched
    * raw scoring, (raw_label ∈ {positive,negative,neutral},
    * raw_score ∈ [0,1]) per input — one output per input, in order.
    */
  trait SentimentModel extends Serializable {
    def scoreBatch(headlines: Seq[String]): Seq[(String, Double)]
    def close(): Unit = ()
  }

  /** Deterministic sandbox model: the same lexicon semantics as
    * [[Sentiment.rawLabel]]/[[Sentiment.rawScore]], evaluated with Java
    * regex instead of codegen'd `regexp_count` — winning-class hits over
    * total hits (0.5 on a tie, 0.0 with no hits).
    */
  final class LexiconModel extends SentimentModel {
    private val posRe = Sentiment.PositiveLexicon
      .map(w => java.util.regex.Pattern.compile("\\b" + w + "\\b"))
    private val negRe = Sentiment.NegativeLexicon
      .map(w => java.util.regex.Pattern.compile("\\b" + w + "\\b"))

    private def countAll(res: Seq[java.util.regex.Pattern], s: String): Int =
      res.map { p =>
        val m = p.matcher(s)
        var c = 0
        while (m.find()) c += 1
        c
      }.sum

    def scoreBatch(headlines: Seq[String]): Seq[(String, Double)] =
      headlines.map { h =>
        // Locale.ROOT: the expression scorer's lower() is locale-
        // independent; default-locale toLowerCase diverges under e.g.
        // Turkish I-dotting and would break the shared oracle
        val lower = h.trim.toLowerCase(java.util.Locale.ROOT)
        val pos = countAll(posRe, lower)
        val neg = countAll(negRe, lower)
        val tot = pos + neg
        if (pos > neg) ("positive", pos.toDouble / tot)
        else if (neg > pos) ("negative", neg.toDouble / tot)
        else if (tot == 0) ("neutral", 0.0)
        else ("neutral", 0.5)
      }
  }

  case class ScoredHeadline(doc_id: Long, headline: String, raw_label: String,
      raw_score: Double, label: String, score: Double)

  /** Spark `round(_, 4)` on the JVM: HALF_UP over the shortest decimal
    * representation (BigDecimal.valueOf), so the batched path rounds
    * bit-identically to the expression path.
    */
  private def round4(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue

  private def isDefault(h: String): Boolean =
    h == null || h.trim.isEmpty || h.trim == Sentiment.DefaultHeadline

  /** M1 through the inference seam: (idCol: Long, headlineCol: String) →
    * the full analyze() row. Contract identical to
    * [[Sentiment.withAnalysis]] — same short-circuit, label map, signed
    * 4-dp score — so the two forms share one DuckDB oracle.
    *
    * M2/M3 wiring (the boundary the reference decorates —
    * sentiment/news provider calls, retry.py:11-44 + news.py:128):
    * `retry` wraps each `scoreBatch` call in
    * [[graft.sources.Resilience.withRetry]]; `minCallIntervalMillis`
    * paces calls per partition through a
    * [[graft.sources.Resilience.RateLimiter]]. Defaults (None / 0) are
    * exact no-ops — the lexicon stub never fails and needs no pacing,
    * so the shipped queries' plans and oracle hashes are untouched; a
    * real remote-backed model passes the reference policy
    * (`RetryPolicy()`, 1000 ms).
    */
  def withBatchedAnalysis(df: DataFrame, idCol: String, headlineCol: String,
      modelFactory: () => SentimentModel,
      batchSize: Int = 64,
      retry: Option[graft.sources.Resilience.RetryPolicy] = None,
      minCallIntervalMillis: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(headlineCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val model = modelFactory() // once per partition, like the lazy pipeline load
        // one limiter per PARTITION: task-local pacing, no cross-task lock
        val limiter = new graft.sources.Resilience.RateLimiter(minCallIntervalMillis)
        // acquire INSIDE the retried thunk: every attempt — not just the
        // first — is paced, and the limiter's slot advances across a
        // retry storm (news.py:128's sleep sits inside the decorated
        // call, so the reference paces per attempt too)
        def attempt(live: Seq[String]): Seq[(String, Double)] = {
          limiter.acquire()
          model.scoreBatch(live)
        }
        def callModel(live: Seq[String]): Seq[(String, Double)] =
          retry match {
            case Some(p) => graft.sources.Resilience.withRetry(p)(attempt(live))
            case None => attempt(live)
          }
        // close-with-partition: the output iterator is lazy, so the only
        // correct hook is task completion (runs after the iterator is
        // drained OR the task dies — either way the native handle frees)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => model.close()))
        rows.grouped(batchSize).flatMap { batch =>
          // T13 short-circuit BEFORE the model, evaluated ONCE per row:
          // structurally empty inputs never reach inference
          // (sentiment.py:85-92) — including the whole-batch-default
          // case, where scoreBatch is not called at all
          val flagged = batch.map { case (id, h) => (id, h, isDefault(h)) }
          val live = flagged.collect { case (_, h, false) => h }
          val raw =
            (if (live.isEmpty) Nil else callModel(live)).iterator
          flagged.map {
            case (id, h, true) =>
              ScoredHeadline(id, h, "neutral", 0.0, "Neutral", 0.0)
            case (id, h, false) =>
              val (rl, rs0) = raw.next()
              val rs = round4(rs0)
              val (label, score) = rl match {
                case "positive" => ("Positive", rs)
                case "negative" => ("Negative", round4(-rs))
                case _ => ("Neutral", 0.0)
              }
              ScoredHeadline(id, h, rl, rs, label, score)
          }
        }
      }.toDF()
  }
}
