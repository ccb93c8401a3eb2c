package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, StatefulOpClusteredDistribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical as-of join: hash-partition both sides on the key, sort each
  * partition by (key, time), then a single streaming merge walk per
  * partition pair — O(|L| + |R|) after the sort, no per-row lookups, no
  * buffering beyond ONE retained right row.
  *
  * Direction costs nothing extra: the walk already has both candidates
  * in hand — the retained `held` row is the backward match, and the
  * next UNCONSUMED right row (`rBuf.head`, first of the same key with
  * time > left time) is the forward match; `nearest` compares their
  * distances, ties to the later row (reference argmin semantics,
  * market.py:121-125).
  *
  * Scale shape: exactly a sort-merge join's exchange profile (one
  * shuffle per side, co-partitioned by EnsureRequirements, sort amortized
  * by the exchange), but the probe is the as-of walk instead of an
  * equality match — the operator a window+join composition approximates
  * with two extra shuffles and a full per-key history join.
  *
  * Tie-break: among right rows with equal (key, time) the LAST in sort
  * order wins for backward (the FIRST for forward) — callers wanting
  * determinism ensure unique (key, time) on the right (the bundled
  * query pre-aggregates).
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    toleranceMicros: Long,
    direction: AsOfDirection = AsOfDirection.Backward) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // StatefulOpClusteredDistribution, not ClusteredDistribution: the merge
  // walk zips child partitions pairwise, so both sides MUST have the
  // exact same HashPartitioning. Plain clustered distributions leave AQE
  // free to coalesce the two exchanges with different boundaries (it
  // only protects the built-in join types) — silent row mis-pairing.
  // This is the same guarantee streaming symmetric hash joins rely on.
  override def requiredChildDistribution: Seq[Distribution] =
    StatefulOpClusteredDistribution(Seq(leftKey), conf.numShufflePartitions) ::
      StatefulOpClusteredDistribution(Seq(rightKey), conf.numShufflePartitions) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey
    val rk = rightKey
    val lt = leftTime
    val rt = rightTime
    val tol = toleranceMicros
    val dir = direction
    val wantFwd = dir != AsOfDirection.Backward
    val keyOrd = TypeUtils.getInterpretedOrdering(lk.dataType)
    val nOut = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyEval = UnsafeProjection.create(Seq(lk), lOut)
      val rKeyEval = UnsafeProjection.create(Seq(rk), rOut)
      val lTimeEval = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeEval = UnsafeProjection.create(Seq(rt), rOut)
      // Bind against a nullability-forced right schema: BoundReference
      // takes `nullable` from the INPUT attribute, and a non-nullable
      // right column would skip the null check and read garbage from the
      // all-null unmatched row.
      val result = UnsafeProjection.create(nOut,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight: InternalRow = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val rBuf = rIter.buffered

      // Retained state: the latest right row (copied — iterators reuse
      // row objects) with key == current left key and time ≤ left time.
      var heldKey: Any = null
      var heldTime: Long = 0L
      var held: InternalRow = null

      lIter.map { l =>
        // no copy: the projection buffer is only rewritten by the NEXT
        // left row, and lKeyVal is not referenced past this iteration
        // (heldKey, which IS retained, is copied where it is captured)
        val lKeyVal = lKeyEval(l).get(0, lk.dataType)
        val lTimeVal = lTimeEval(l).getLong(0)
        // Drop held state from an earlier key.
        if (held != null && keyOrd.compare(heldKey.asInstanceOf[AnyRef],
            lKeyVal.asInstanceOf[AnyRef]) != 0) {
          held = null
        }
        // Advance the right side: consume every row at a smaller key, and
        // every same-key row with time ≤ left time (later ones overwrite —
        // sorted input makes the last retained row the as-of match).
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val r = rBuf.head
          val rKeyVal = rKeyEval(r).get(0, rk.dataType)
          val cmp = keyOrd.compare(rKeyVal.asInstanceOf[AnyRef],
            lKeyVal.asInstanceOf[AnyRef])
          if (cmp < 0) {
            rBuf.next() // smaller key: discard
          } else if (cmp == 0) {
            val rTimeVal = rTimeEval(r).getLong(0)
            if (rTimeVal <= lTimeVal) {
              held = rBuf.next().copy()
              heldKey = rKeyEval(held).copy().get(0, rk.dataType)
              heldTime = rTimeVal
            } else advancing = false
          } else advancing = false
        }
        // Backward candidate: the retained row; forward candidate: the
        // next unconsumed right row when it is the same key within
        // tolerance (NOT consumed — later left rows re-check it).
        val backOk = held != null && (lTimeVal - heldTime) <= tol
        var fwd: InternalRow = null
        var fwdTime = 0L
        if (wantFwd && rBuf.hasNext) {
          val r = rBuf.head
          val rKeyVal = rKeyEval(r).get(0, rk.dataType)
          if (keyOrd.compare(rKeyVal.asInstanceOf[AnyRef],
              lKeyVal.asInstanceOf[AnyRef]) == 0) {
            val t = rTimeEval(r).getLong(0)
            if (t - lTimeVal <= tol) { fwd = r; fwdTime = t }
          }
        }
        val chosen = dir match {
          case AsOfDirection.Backward => if (backOk) held else null
          case AsOfDirection.Forward => fwd
          case AsOfDirection.Nearest =>
            if (backOk && fwd != null) {
              // tie (equal distance) -> the LATER row (forward)
              if (lTimeVal - heldTime < fwdTime - lTimeVal) held else fwd
            } else if (backOk) held
            else fwd
        }
        result(joined(l, if (chosen != null) chosen else nullRight))
      }
    }
  }
}

/** Broadcast as-of join — the shape for the COMMON asymmetry where the
  * right side is a small dimension-like history (quarterly fundamentals)
  * and the left is the 100 TB fact: the merge exec must hash-shuffle
  * BOTH sides, but with the right side broadcast the left stays exactly
  * where it is — zero exchanges, zero sorts on the big side. Each task
  * builds one (key → time-sorted rows) index from the broadcast and
  * binary-searches it per left row: O(|L| log |R_k|) with no left
  * repartitioning.
  *
  * Picked by [[AsOfJoinStrategy]] when the right side's stats fit under
  * `spark.sql.autoBroadcastJoinThreshold` — the same stats-driven
  * criterion as the built-in broadcast joins (and why [[AsOfJoin]]
  * reports honest sizes). Tie semantics match the merge exec: equal
  * right (key, time) rows resolve to the LAST in input order for
  * backward, the FIRST for forward (stable sort preserves input order).
  */
case class BroadcastAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    toleranceMicros: Long,
    direction: AsOfDirection = AsOfDirection.Backward) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val rBroadcast = right.executeBroadcast[Array[InternalRow]]()
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey
    val rk = rightKey
    val lt = leftTime
    val rt = rightTime
    val tol = toleranceMicros
    val dir = direction
    val nOut = output
    left.execute().mapPartitions({ lIter =>
      val rKeyEval = UnsafeProjection.create(Seq(rk), rOut)
      val rTimeEval = UnsafeProjection.create(Seq(rt), rOut)
      val lKeyEval = UnsafeProjection.create(Seq(lk), lOut)
      val lTimeEval = UnsafeProjection.create(Seq(lt), lOut)
      val result = UnsafeProjection.create(nOut,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight: InternalRow = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      // key → (times sorted asc, rows in the same order), built ONCE per
      // executor and shared by every task on the same broadcast value —
      // without the cache, 32 concurrent tasks would each hold a full
      // index copy (the same reason Spark broadcasts a prebuilt
      // HashedRelation for its hash joins). Read-only after the locked
      // build, so concurrent reads are safe. Stable sort keeps input
      // order among equal times.
      val index = BroadcastAsOfJoinExec.indexFor(rBroadcast.value, { () =>
        val out = new java.util.HashMap[Any, (Array[Long], Array[InternalRow])]()
        val tmp = new java.util.HashMap[Any, scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]()
        for (r <- rBroadcast.value) {
          // copy: the projection buffer is reused and map keys outlive it
          val k = rKeyEval(r).copy().get(0, rk.dataType)
          val t = rTimeEval(r).getLong(0)
          var buf = tmp.get(k)
          if (buf == null) {
            buf = new scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]()
            tmp.put(k, buf)
          }
          buf += ((t, r))
        }
        tmp.forEach { (k, buf) =>
          val sorted = buf.sortBy(_._1)
          out.put(k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
        }
        out
      })

      lIter.map { l =>
        val k = lKeyEval(l).get(0, lk.dataType)
        val lTimeVal = lTimeEval(l).getLong(0)
        val entry = index.get(k)
        var chosen: InternalRow = null
        if (entry != null) {
          val (times, rows) = entry
          // first index with time > lTimeVal
          var lo = 0
          var hi = times.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (times(mid) <= lTimeVal) lo = mid + 1 else hi = mid
          }
          val backOk = lo > 0 && lTimeVal - times(lo - 1) <= tol
          val fwdOk = lo < times.length && times(lo) - lTimeVal <= tol
          chosen = dir match {
            case AsOfDirection.Backward => if (backOk) rows(lo - 1) else null
            case AsOfDirection.Forward => if (fwdOk) rows(lo) else null
            case AsOfDirection.Nearest =>
              if (backOk && fwdOk) {
                // tie (equal distance) -> the LATER row (forward)
                if (lTimeVal - times(lo - 1) < times(lo) - lTimeVal) rows(lo - 1)
                else rows(lo)
              } else if (backOk) rows(lo - 1)
              else if (fwdOk) rows(lo)
              else null
          }
        }
        result(joined(l, if (chosen != null) chosen else nullRight))
      }
    }, preservesPartitioning = true)
  }
}

object BroadcastAsOfJoinExec {
  // weakly keyed on the broadcast VALUE: entries vanish when the
  // broadcast is GC'd; SynchronizedMap.computeIfAbsent is atomic, so
  // the index builds once per executor
  private val indexCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[AnyRef, AnyRef]())

  private[plans] def indexFor(
      key: AnyRef,
      build: () => java.util.HashMap[Any, (Array[Long], Array[InternalRow])])
      : java.util.HashMap[Any, (Array[Long], Array[InternalRow])] =
    indexCache.computeIfAbsent(key, _ => build())
      .asInstanceOf[java.util.HashMap[Any, (Array[Long], Array[InternalRow])]]
}
