package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** T7 title relevance as a native Catalyst expression — the SURVEY.md
  * §7.3 "perf upgrade" over the Scala UDF for the dynamic case where the
  * company name/ticker are per-row columns (so the regex pattern is not
  * plan-time foldable and [[graft.operators.Text.standaloneMatch]]'s
  * literal form cannot apply).
  *
  * Why it beats the UDF: whole-stage codegen calls the static matcher
  * directly on UTF8String inputs (no Catalyst↔Scala converters, no row
  * boxing), and compiled regex patterns are cached per thread keyed by
  * phrase — the UDF recompiles three patterns per row.
  *
  * Null semantics follow TernaryExpression: any null input → null (pass
  * `lit("")` for "no ticker", matching news_utils.py's optional-term
  * behavior).
  */
case class RelevantTitle(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "relevant_title"

  override protected def nullSafeEval(title: Any, longName: Any, ticker: Any): Any =
    RelevantTitleMatcher.matches(
      title.asInstanceOf[UTF8String],
      longName.asInstanceOf[UTF8String],
      ticker.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n, k) =>
      s"graft.expressions.RelevantTitleMatcher.matches($t, $n, $k)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): RelevantTitle =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object RelevantTitle {
  /** Column-API entry point — resolves through the function registry, so
    * the session must be built with [[graft.GraftExtensions]]
    * (`spark.sql.extensions=graft.GraftExtensions`).
    */
  def apply(title: Column, longName: Column, ticker: Column): Column =
    call_function("relevant_title", title, longName, ticker)
}

/** Static matcher called from generated code. Mirrors
  * news_utils.py:40-79 exactly: for each of {long name, stripped long
  * name, ticker}, accept if some `\b phrase \b` occurrence's preceding
  * text, right-stripped, is empty or ends in a non-letter.
  */
object RelevantTitleMatcher {
  // Compiled patterns cached per thread, keyed by the lowercased phrase.
  // Bounded in practice by the company-dimension cardinality per task.
  private val cache: ThreadLocal[java.util.HashMap[String, java.util.regex.Pattern]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, java.util.regex.Pattern]())

  private def pattern(phrase: String): java.util.regex.Pattern =
    cache.get.computeIfAbsent(phrase, p =>
      java.util.regex.Pattern.compile("\\b" + java.util.regex.Pattern.quote(p) + "\\b"))

  private def standalone(titleLower: String, phrase: String): Boolean = {
    if (phrase.isEmpty) return false
    val m = pattern(phrase).matcher(titleLower)
    while (m.find()) {
      var i = m.start() - 1
      while (i >= 0 && Character.isWhitespace(titleLower.charAt(i))) i -= 1
      if (i < 0 || !Character.isLetter(titleLower.charAt(i))) return true
    }
    false
  }

  def matches(title: UTF8String, longName: UTF8String, ticker: UTF8String): Boolean = {
    val t = title.toString.toLowerCase
    val name = longName.toString.toLowerCase
    val stripped = graft.operators.Text.stripSuffixLiteral(name)
    val tick = ticker.toString.toLowerCase
    standalone(t, name) ||
      (stripped.nonEmpty && standalone(t, stripped)) ||
      (tick.nonEmpty && standalone(t, tick))
  }
}
