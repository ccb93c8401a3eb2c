package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text predicates of the news stage (reference: src/core/news_utils.py).
  *
  *  - T6 `stripSuffix`   — news_utils.py:23-37 (suffix list :18-21)
  *  - T7 `standaloneMatch` / `relevantTitle` — news_utils.py:40-79
  *  - T9 `nonEmptyTitle`  — news.py:157-159,285-287
  *
  * All three are pure built-in expressions (regexp_replace / regexp_like /
  * trim), so they stay inside whole-stage codegen and push as ordinary
  * predicates — no UDF in the hot path. [[Text.relevantTitleUdf]] exists
  * only for the dynamic case where the company name is a per-row column
  * (regex pattern not known at plan time); prefer the literal-phrase forms.
  */
object Text {

  /** Corporate suffixes stripped before constructing search queries
    * (news_utils.py:18-21). Only true legal suffixes — business
    * descriptors like 'Industries' are intentionally excluded.
    */
  val CorporateSuffixes: Seq[String] =
    Seq("limited", "ltd", "ltd.", "corporation", "corp", "corp.")

  /** `[\s,]+(limited|ltd|ltd\.|corporation|corp|corp\.)[\s.]*$`, applied
    * case-insensitively (news_utils.py:36). Alternation order does not
    * matter for replacement: `[\s.]*$` absorbs whatever a longer
    * alternative would have taken, so the replaced span is identical.
    */
  val SuffixPattern: String =
    "(?i)[\\s,]+(" +
      CorporateSuffixes.map(java.util.regex.Pattern.quote).mkString("|") +
      ")[\\s.]*$"

  /** T6: remove a trailing corporate suffix, then trim (news_utils.py:23-37).
    * "Bank of India Limited" → "Bank of India"; "Hindustan Zinc Ltd." →
    * "Hindustan Zinc".
    */
  def stripSuffix(name: Column): Column =
    trim(regexp_replace(name, SuffixPattern, ""))

  /** T7 core: `phrase` appears in `text` as a standalone phrase — i.e. a
    * `\b phrase \b` occurrence whose preceding text, after rstrip, is empty
    * or ends in a non-letter (news_utils.py:61-68). So "State Bank of
    * India" does NOT match phrase "bank of india" (preceded by the letter
    * 'k' of "State"… after rstrip "state"), while "Vedanta, BPCL, Hindustan
    * Zinc among…" matches "hindustan zinc" (comma precedes).
    *
    * Encoded as a single regex — acceptance positions are exactly
    * `^\s*` or `[^letter, non-space]\s*`:
    *   (?:^\s*|[^\p{L}\s]\s*)\bphrase\b
    * The leading `\b` keeps "state9bank" rejected ('9' matches the
    * non-letter class but no word boundary follows). Caller passes
    * lowercased text; phrases are lowercased here. ASCII word boundaries
    * (Python's unicode `\b` differs only on non-ASCII word chars, absent
    * from this corpus).
    */
  def standalonePattern(phrase: String): String =
    "(?:^\\s*|[^\\p{L}\\s]\\s*)\\b" +
      java.util.regex.Pattern.quote(phrase.toLowerCase) + "\\b"

  def standaloneMatch(lowerText: Column, phrase: String): Column =
    regexp_like(lowerText, lit(standalonePattern(phrase)))

  /** T7: title relevance — long name, stripped long name, or ticker
    * standalone-matches the lowercased title (news_utils.py:40-79).
    * Phrase literals are resolved at plan time (driver-side suffix strip
    * mirrors strip_suffix), so the whole predicate is codegen'd regexps.
    */
  def relevantTitle(title: Column, longName: String, ticker: String = ""): Column = {
    val lower = org.apache.spark.sql.functions.lower(title)
    val stripped = stripSuffixLiteral(longName)
    val checks =
      Seq(standaloneMatch(lower, longName)) ++
      (if (stripped.nonEmpty) Seq(standaloneMatch(lower, stripped)) else Nil) ++
      (if (ticker.nonEmpty) Seq(standaloneMatch(lower, ticker)) else Nil)
    checks.reduce(_ || _)
  }

  /** Driver-side twin of [[stripSuffix]] for plan-time phrase literals. */
  def stripSuffixLiteral(name: String): String =
    name.replaceAll(SuffixPattern, "").trim

  /** T9: drop rows with blank/missing titles (news.py:157-159,285-287). */
  def nonEmptyTitle(title: Column): Column =
    length(trim(title)) > 0

  /** Dynamic-name variant of T7 for per-row company names (e.g. the alias
    * dimension joined onto candidates). A literal port of
    * `_is_relevant_title` — finditer + preceding-char check — as a
    * deterministic Scala UDF. Not codegen'd; use only where the phrase is
    * genuinely data-dependent (SURVEY.md §7.3).
    */
  val relevantTitleUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (title: String, longName: String, ticker: String) =>
      if (title == null || longName == null) false
      else {
        val t = title.toLowerCase
        def standalone(phrase: String): Boolean = {
          if (phrase.isEmpty) false
          else {
            val m = java.util.regex.Pattern
              .compile("\\b" + java.util.regex.Pattern.quote(phrase) + "\\b")
              .matcher(t)
            var found = false
            while (!found && m.find()) {
              val before = t.substring(0, m.start()).replaceAll("\\s+$", "")
              if (before.isEmpty || !before.last.isLetter) found = true
            }
            found
          }
        }
        standalone(longName.toLowerCase) ||
          standalone(stripSuffixLiteral(longName).toLowerCase) ||
          (ticker != null && ticker.nonEmpty && standalone(ticker.toLowerCase))
      }
    }.asNonNullable()
}
