package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregate — the scale-right form of "rank ≤ k per
  * group": a `row_number` window must SORT every row of every group
  * (one wide exchange + per-group full sort), while an aggregate with a
  * k-bounded buffer keeps at most k rows per partition per group and
  * map-side-combines before the shuffle — at 100 TB the exchange carries
  * k·|groups| rows instead of the whole table.
  *
  * This is the `Aggregator[IN, BUF, OUT]` / TypedColumn extension path
  * (SURVEY.md §7.3 option b for aggregate functions): typed, codegen'd
  * Tungsten-encoded buffers, registered per-session via
  * `functions.udaf`.
  *
  * Ordering is (count DESC, tag ASC) — fully deterministic for unique
  * (count, tag) inputs, mirrored in the DuckDB oracle's ORDER BY.
  */
class TopKByCount(k: Int)
    extends Aggregator[(Long, String), Seq[(Long, String)], Seq[(Long, String)]] {

  private def ord: Ordering[(Long, String)] =
    Ordering.by[(Long, String), (Long, String)] { case (c, t) => (-c, t) }

  private def trim(xs: Seq[(Long, String)]): Seq[(Long, String)] =
    xs.sorted(ord).take(k)

  override def zero: Seq[(Long, String)] = Nil

  override def reduce(buf: Seq[(Long, String)], x: (Long, String)): Seq[(Long, String)] =
    // cheap bound: only re-sort when the candidate can displace the tail
    if (buf.size < k || ord.lt(x, buf.last)) trim(buf :+ x) else buf

  override def merge(a: Seq[(Long, String)], b: Seq[(Long, String)]): Seq[(Long, String)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Long, String)]): Seq[(Long, String)] = buf.sorted(ord)

  override def bufferEncoder: Encoder[Seq[(Long, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, String)]]()

  override def outputEncoder: Encoder[Seq[(Long, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, String)]]()
}

/** Top-k (score DESC, id ASC) — the ANN ranking order. Same bounded-
  * buffer design as [[TopKByCount]]; ties on score (callers rank on the
  * 6-dp ROUNDED cosine) break to the lower id, so the result is
  * deterministic and identical to the `row_number` window it replaces.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }

  private def trim(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sorted(ord).take(k)

  override def zero: Seq[(Double, Long)] = Nil

  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size < k || ord.lt(x, buf.last)) trim(buf :+ x) else buf

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf.sorted(ord)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopK {
  /** Column form: `topKByCount(5)(col("cnt"), col("token"))` → array of
    * (cnt, tag) structs, count-descending.
    */
  def topKByCount(k: Int): (Column, Column) => Column = {
    val f = udaf(new TopKByCount(k))
    (cnt, tag) => f(cnt, tag)
  }

  /** Column form: array of (score, id) structs, score-descending. */
  def topKByScore(k: Int): (Column, Column) => Column = {
    val f = udaf(new TopKByScore(k))
    (score, id) => f(score, id)
  }
}
