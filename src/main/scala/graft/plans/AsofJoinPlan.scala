package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join: the whole-operator Catalyst extension
  * (LogicalPlan + SparkStrategy + SparkPlan, registered through
  * `SparkSessionExtensions`) — the last tier of the extension ladder,
  * for semantics where composing built-ins pays real overhead.
  *
  * The composed twin ([[graft.operators.AsofJoin.asofBackward]]:
  * union + window + filter) funnels N+M rows through one window sort
  * per key and materializes every carried column through the window
  * frame. This exec is the shape a time-series engine uses: both
  * sides hash-cluster on the key and sort by (key, time) — a
  * sort-merge join's requirements, satisfied by Spark's own
  * EnsureRequirements (which also co-partitions the sides) — then one
  * forward merge pass per partition emits each left row joined to the
  * latest right row at or before its timestamp. O(1) state per key
  * (the last-seen right values), no union, no window buffer.
  *
  * Semantics match the composed twin exactly: time ties resolve to
  * the right row, null keys group and match each other (the window-
  * partition behavior), null times sort first (-inf). AsofJoinSpec
  * pins native == composed on shared inputs; q38's oracle replays the
  * semantics in SQL.
  *
  * Children are referenced by OUTPUT ORDINAL, not by attribute — the
  * node survives analyzer re-aliasing (e.g. self-join relation
  * deduplication) because a child's output order is stable where its
  * expression ids are not. Time columns are pre-lowered to LONG sort
  * keys by `AsofJoin.asofBackwardNative` with the same precision-
  * preserving mapping as the composed twin.
  *
  * @param carried fresh nullable output attributes, one per carried
  *                right value column (in `rightValIdx` order)
  */
case class AsofJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeyIdx: Int, rightKeyIdx: Int,
    leftTimeIdx: Int, rightTimeIdx: Int,
    rightValIdx: Seq[Int],
    carried: Seq[AttributeReference]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ carried
  // the carried attributes are synthesized HERE, not read from the
  // children — declared so CheckAnalysis' missingInput test passes
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(carried)
  // ordinal addressing means EVERY child column is load-bearing: an
  // expression-blind optimizer rule (ColumnPruning) would otherwise
  // prune or re-project the children and silently shift the ordinals
  override lazy val references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt, rv, carried) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv, carried) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeyIdx: Int, rightKeyIdx: Int,
    leftTimeIdx: Int, rightTimeIdx: Int,
    rightValIdx: Seq[Int],
    carried: Seq[AttributeReference]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ carried
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(carried)

  private def leftKey: Attribute = left.output(leftKeyIdx)
  private def rightKey: Attribute = right.output(rightKeyIdx)

  // key-clustered children; EnsureRequirements co-partitions the two
  // sides (the same mechanism sort-merge join relies on)
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  // (key, time) ascending both sides; Ascending's default NullsFirst
  // matches the merge's null-key / -inf-time handling
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending),
      SortOrder(left.output(leftTimeIdx), Ascending)),
    Seq(SortOrder(rightKey, Ascending),
      SortOrder(right.output(rightTimeIdx), Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val keyType = leftKey.dataType
    val valTypes = rightValIdx.map(i => right.output(i).dataType).toArray
    val rValIdx = rightValIdx.toArray
    val outAttrs = output
    val lKeyIdx = leftKeyIdx; val lTimeIdx = leftTimeIdx
    val rKeyIdx = rightKeyIdx; val rTimeIdx = rightTimeIdx

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      // nulls-first total order over possibly-null keys, mirroring the
      // children's SortOrder null placement
      def cmpKeys(a: Any, b: Any): Int =
        if (a == null && b == null) 0
        else if (a == null) -1
        else if (b == null) 1
        else keyOrd.compare(a, b)
      def timeOf(row: InternalRow, idx: Int): Long =
        if (row.isNullAt(idx)) Long.MinValue else row.getLong(idx)

      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow

      // last-seen right values for the key currently being merged
      var lastKey: Any = null
      var hasLast = false
      val lastVals = new Array[Any](rValIdx.length)
      var rHead: InternalRow = null // lookahead (owned copy)

      def advanceRight(): Unit =
        rHead = if (rIt.hasNext) rIt.next().copy() else null

      advanceRight()
      // staging buffer reused across rows: proj() copies every slot
      // into the emitted UnsafeRow, so per-row allocation here would be
      // pure GC pressure in the merge hot loop
      val carriedRow = new GenericInternalRow(rValIdx.length)
      lIt.map { lRow =>
        val lk = lRow.get(lKeyIdx, keyType)
        val lt = timeOf(lRow, lTimeIdx)
        // consume every right row at or before (lk, lt)
        var advancing = true
        while (advancing && rHead != null) {
          val rk = rHead.get(rKeyIdx, keyType)
          val c = cmpKeys(rk, lk)
          if (c < 0 || (c == 0 && timeOf(rHead, rTimeIdx) <= lt)) {
            // record only genuinely matchable right rows: a NULL key or
            // NULL time never matches (DuckDB-ASOF semantics; the
            // operators-layer wrapper filters them, this guard keeps
            // the exec correct standalone) — the row is still consumed
            if (c == 0 && rk != null && !rHead.isNullAt(rTimeIdx)) {
              var i = 0
              while (i < rValIdx.length) {
                lastVals(i) =
                  if (rHead.isNullAt(rValIdx(i))) null
                  else InternalRow.copyValue(rHead.get(rValIdx(i), valTypes(i)))
                i += 1
              }
              // copy from the owned right row — `lk` may reference the
              // left iterator's reused buffer
              lastKey = InternalRow.copyValue(rk)
              hasLast = true
            }
            advanceRight()
          } else advancing = false
        }
        // a NULL left key or NULL left time matches nothing: the
        // composed twin sorts the null time key BEFORE every real
        // time (NullsFirst) including Long.MinValue, whereas timeOf
        // maps null to MinValue — without the explicit guard a right
        // row at literally MinValue would match it
        val matched = lk != null && !lRow.isNullAt(lTimeIdx) &&
          hasLast && cmpKeys(lastKey, lk) == 0
        if (matched) {
          var i = 0
          while (i < rValIdx.length) { carriedRow.update(i, lastVals(i)); i += 1 }
        } else {
          var i = 0
          while (i < rValIdx.length) { carriedRow.update(i, null); i += 1 }
        }
        proj(joined(lRow, carriedRow))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
