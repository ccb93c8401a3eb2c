package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming temperature-mix admission — the live-ingest form of
  * [[graft.operators.Sampling.temperatureMix]]: per-source √-weighted
  * document TARGETS are frozen from a calibration snapshot
  * ([[graft.operators.Sampling.temperatureTargets]] — rates need the
  * whole corpus to normalize, which a stream never has), and admission
  * enforces each target with a per-source running count: the first
  * `target(source)` arrivals are admitted in (ts, doc_id) order, the
  * rest suppressed. The batch mix keeps a content-hash-keyed SAMPLE at
  * the equivalent rate; a stream admits the arrival-order PREFIX — the
  * same divergence-and-reason as [[StreamingQuota.admitUpTo]] vs the
  * batch best-N cap, here per-source-sized by the temperature rule.
  *
  * State per source is ONE admitted-count long — constant no matter how
  * many documents arrive; sources shard across executors by the
  * groupByKey hash, and the frozen target dim (|sources| entries) ships
  * inside the function closure like any broadcast dim.
  */
object StreamingMix {

  case class Doc(source: String, doc_id: Long, ts: java.sql.Timestamp)
  case class Admitted(source: String, doc_id: Long,
      ts: java.sql.Timestamp, adm_rank: Int)

  /** Use with `outputMode("append")`. A source absent from `targets`
    * admits nothing (a brand-new source waits for the next calibration
    * refresh — the conservative production default). Docs inside one
    * micro-batch are processed in (ts, doc_id) order per source (Spark
    * does not order the iterator), so replays are deterministic.
    */
  def admitToTargets(ds: Dataset[Doc],
      targets: Map[String, Long]): Dataset[Admitted] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.source)
      .flatMapGroupsWithState[Long, Admitted](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (src: String, docs: Iterator[Doc], state: GroupState[Long]) =>
          val target = targets.getOrElse(src, 0L)
          var n = state.getOption.getOrElse(0L)
          // exhausted source: O(1) per batch, not O(batch) — same
          // flood guard as StreamingQuota
          if (n >= target) Iterator.empty
          else {
            val out = Seq.newBuilder[Admitted]
            for (d <- docs.toSeq.sortBy(d => (d.ts.getTime, d.doc_id))
                 if n < target) {
              n += 1
              out += Admitted(src, d.doc_id, d.ts, n.toInt)
            }
            state.update(n)
            out.result().iterator
          }
      }
  }

  /** Batch twin of [[admitToTargets]] (calibrated on `df` itself) so the
    * driver's DuckDB oracle can hash-check the streaming semantics:
    * "first target_s arrivals per source" is min-target_s by (ts, id) —
    * the k-bounded TopKByScore aggregate on negated event-time micros
    * (capPerKey with cap = max target; each partition map-side combines
    * to ≤ cap rows per source before the shuffle), cut per source to its
    * own target by the broadcast frozen dim. The admitted set is at most
    * `budget` rows at ANY corpus size — the bounded result the oracle
    * hashes row-for-row.
    *
    * @return (sourceCol, target, idCol, adm_rank) — one row per admitted
    *         doc, adm_rank 1..target in arrival order
    */
  def mixAdmitScan(df: DataFrame, sourceCol: String, idCol: String,
      timeCol: String, budget: Long): DataFrame = {
    // bounded |sources|-row collect — the same calibration discipline as
    // temperatureMix's rate dim
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val targets = graft.operators.Sampling.temperatureTargets(counts, budget)
    val maxTarget = targets.map(_._3).max
    require(maxTarget >= 1,
      s"budget $budget yields zero admission for every source")
    val session = df.sparkSession
    import session.implicits._
    val dim = targets.map { case (src, _, t) => (src, t) }
      .toDF(sourceCol, "target")
    graft.operators.Sampling.capPerKey(df, sourceCol, idCol,
        (-unix_micros(col(timeCol))).cast("double"), maxTarget.toInt)
      .join(broadcast(dim), Seq(sourceCol))
      .filter(col("rank") <= col("target"))
      .select(col(sourceCol), col("target"), col(idCol),
        col("rank").as("adm_rank"))
  }
}
