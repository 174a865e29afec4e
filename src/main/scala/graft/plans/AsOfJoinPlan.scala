package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a first-class Catalyst operator — the custom-`SparkPlan`
  * tier of the extension ladder (expression < rule < whole-operator; the
  * first two tiers live in `graft.functions`).
  *
  * Why a custom operator when [[graft.queries.TemporalOps.asofJoin]] already
  * composes the semantics from built-ins: the composed form unions both
  * sides and runs a running-`last()` window per payload column — one shuffle
  * of (|L|+|R|) rows plus window state per column. This operator plans like
  * a sort-merge join instead: `requiredChildDistribution` co-partitions the
  * two sides on the key (the planner inserts only the exchanges that are
  * actually missing — an already-bucketed side shuffles nothing),
  * `requiredChildOrdering` gets each partition sorted by (key, ts, tie),
  * and the exec streams both sorted iterators with ONE buffered right row —
  * O(1) state per partition, payload-width independent, no window machinery.
  * At 100 TB this is the difference between re-sorting a union of two
  * corpus-scale tables and a pair of co-partitioned sorted scans.
  *
  * Semantics (identical to the composed form, differentially tested in
  * `AsOfJoinNativeSpec`): for each left row, attach the payload of the last
  * right row of the same key with (ts, tie) <= (left ts, left tie)
  * lexicographically; null payload when none exists. Null keys and null
  * timestamps never match.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    leftTie: Expression,
    rightTie: Expression,
    payload: Seq[Attribute],
    tolerance: Option[Long] = None) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] into [[AsOfJoinExec]]; everything else falls through. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts, ltb, rtb, payload, tol) =>
      AsOfJoinExec(lk, rk, lts, rts, ltb, rtb, payload, tol,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    leftTie: Expression,
    rightTie: Expression,
    payload: Seq[Attribute],
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  // Co-partition both sides on the key; EnsureRequirements adds exchanges
  // only where the child's existing partitioning is incompatible.
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  // Per-partition merge order: (key, ts, tie) ascending on both sides.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending),
      SortOrder(leftTie, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  // The exec is a per-partition zip: rows keep the left child's physical
  // placement, so advertise it — a downstream aggregate/join on the key
  // reuses the exchange instead of re-shuffling (asserted in
  // AsOfJoinNativeSpec).
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val tieOrd = TypeUtils.getInterpretedOrdering(leftTie.dataType)
    val payloadAttrs = payload
    val (lk, lts, ltb) = (leftKey, leftTs, leftTie)
    val (rk, rts, rtb) = (rightKey, rightTs, rightTie)
    val leftOut = left.output
    val rightOut = right.output
    val fullOut = output
    val tol = tolerance
    val numOutputRows = longMetric("numOutputRows")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyE = BindReferences.bindReference(lk, leftOut)
      val lTsE = BindReferences.bindReference(lts, leftOut)
      val lTbE = BindReferences.bindReference(ltb, leftOut)
      val rKeyE = BindReferences.bindReference(rk, rightOut)
      val rTsE = BindReferences.bindReference(rts, rightOut)
      val rTbE = BindReferences.bindReference(rtb, rightOut)
      val payloadProj = UnsafeProjection.create(payloadAttrs, rightOut)
      val resultProj = UnsafeProjection.create(fullOut, fullOut)
      val nullPayload = new GenericInternalRow(payloadAttrs.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // one-row lookahead on the right side
        private var rRow: InternalRow = _
        private var rKeyV: Any = _
        private var rTsV: Any = _
        private var rTbV: Any = _
        private var rValid = false
        advanceRight()

        // payload of the last visible right row, for the current left key
        private var matchKey: Any = _
        private var matchRow: InternalRow = _
        private var matchTs: Long = 0L // only read when tolerance is set

        private def advanceRight(): Unit = {
          rValid = rIter.hasNext
          if (rValid) {
            rRow = rIter.next()
            rKeyV = rKeyE.eval(rRow)
            rTsV = rTsE.eval(rRow)
            rTbV = rTbE.eval(rRow)
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKeyV = lKeyE.eval(lRow)
          val lTsV = lTsE.eval(lRow)
          val lTbV = lTbE.eval(lRow)
          if (lKeyV == null) {
            joined(lRow, nullPayload)
          } else {
            if (matchKey == null || keyOrd.compare(matchKey, lKeyV) != 0) {
              // Copy: for buffer-backed types (UTF8String, Decimal, Binary,
              // struct) the evaluated value aliases the mutable UnsafeRow the
              // sorted child iterator reuses across next() calls — retaining
              // it uncopied would silently track the current row's key and
              // the key-change check above would never fire.
              matchKey = InternalRow.copyValue(lKeyV)
              matchRow = null
            }
            // consume right rows that fall at-or-before this left row
            var continue = rValid
            while (continue) {
              if (rKeyV == null) advanceRight() // null keys never match
              else {
                val kc = keyOrd.compare(rKeyV, lKeyV)
                if (kc < 0) advanceRight() // earlier key group: discard
                else if (kc > 0) continue = false
                else if (rTsV == null) advanceRight() // null ts never matches
                else if (lTsV == null) continue = false
                else {
                  val tc = tsOrd.compare(rTsV, lTsV)
                  val visible = tc < 0 ||
                    (tc == 0 && tieOrd.compare(rTbV, lTbV) <= 0)
                  if (visible) {
                    matchRow = payloadProj(rRow).copy()
                    if (tol.isDefined) matchTs = rTsV.asInstanceOf[Long]
                    advanceRight()
                  } else continue = false
                }
              }
              if (!rValid) continue = false
            }
            // merge_asof-style tolerance: a match older than `tol` time units
            // (same unit as the LONG ts columns) yields the null payload.
            // Wrap-safe (the BandJoinExec eviction idiom): the true gap is
            // non-negative by as-of construction, so a NEGATIVE difference
            // means the subtraction wrapped (a gap over 2^63) — by
            // definition beyond any tolerance, never "fresh".
            val inTol = tol.isEmpty || (lTsV != null && {
              val gap = lTsV.asInstanceOf[Long] - matchTs
              gap >= 0 && gap <= tol.get
            })
            val p = if (matchRow != null && lTsV != null && inTol) matchRow
                    else nullPayload
            joined(lRow, p)
          }
          numOutputRows += 1
          resultProj(joined)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
