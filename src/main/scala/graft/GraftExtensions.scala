package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{CosineSim, DotProduct, NfcNormalize, RelevantTitle, SortedIntersectCount, SquaredL2}

/** Session extensions registering graft's native Catalyst expressions
  * (SURVEY.md §7.3 — custom `Expression`s as the perf upgrade path).
  *
  * Activate with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * on the session builder; the functions then resolve by name through the
  * registry (SQL `relevant_title(...)` or `call_function`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("relevant_title"),
      new ExpressionInfo(classOf[RelevantTitle].getName, "relevant_title"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          s"relevant_title(title, long_name, ticker) takes 3 arguments, got ${args.length}")
        RelevantTitle(args(0), args(1), args(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"sorted_intersect_count(a, b) takes 2 arguments, got ${args.length}")
        SortedIntersectCount(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"dot_product(a, b) takes 2 arguments, got ${args.length}")
        DotProduct(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"cosine_sim(a, b) takes 2 arguments, got ${args.length}")
        CosineSim(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("squared_l2"),
      new ExpressionInfo(classOf[SquaredL2].getName, "squared_l2"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"squared_l2(a, b) takes 2 arguments, got ${args.length}")
        SquaredL2(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          s"nfc_normalize(s) takes 1 argument, got ${args.length}")
        NfcNormalize(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("karp_rabin_hashes"),
      new ExpressionInfo(classOf[graft.expressions.KarpRabinHashes].getName,
        "karp_rabin_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"karp_rabin_hashes(text, k) takes 2 arguments, got ${args.length}")
        require(args(1).foldable, "karp_rabin_hashes: k must be a literal")
        graft.expressions.KarpRabinHashes(args(0),
          args(1).eval().asInstanceOf[Number].intValue(),
          graft.operators.TextAnalysis.WinnowBase,
          graft.operators.TextAnalysis.WinnowMod)
      }))
    ext.injectFunction((
      new FunctionIdentifier("window_minima"),
      new ExpressionInfo(classOf[graft.expressions.WindowMinima].getName,
        "window_minima"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"window_minima(hashes, w) takes 2 arguments, got ${args.length}")
        require(args(1).foldable, "window_minima: w must be a literal")
        graft.expressions.WindowMinima(args(0),
          args(1).eval().asInstanceOf[Number].intValue())
      }))
    // Whole-operator extension (SURVEY.md §7.3 option c): the native
    // as-of join's planner strategy + the optimizer rule restoring
    // predicate pushdown through the custom logical node.
    ext.injectPlannerStrategy(_ => new graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => new graft.plans.PushFilterThroughAsOfJoin)
  }
}
