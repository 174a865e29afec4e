package graft.plans

import scala.collection.mutable.ArrayDeque

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Band (interval) join as a first-class Catalyst operator — the second
  * custom-`SparkPlan` tier demonstration next to [[AsOfJoin]].
  *
  * Semantics (identical to the composed bucket-probe form in
  * `graft.queries.TemporalOps.rangeJoin`, differentially tested in
  * `BandJoinNativeSpec`): all (early, late) row pairs sharing the key with
  *   0 < late.ts - early.ts <= range.
  * Null keys never match; output is left (early) columns ++ right (late)
  * columns, inner-join style.
  *
  * Why a custom operator when the bucketed compose already avoids the
  * nested loop: the compose EXPLODES the early side into two bucket probes
  * (2x its shuffle volume), then post-filters the half-false candidates.
  * This operator plans like a sort-merge join instead: both sides
  * co-partition on the key and sort by (key, ts); the exec sweeps the late
  * side once, holding only the early rows inside the current band in a
  * deque — each side shuffles exactly once at its own size, no explode, no
  * post-filter, and state per partition is bounded by the band's row
  * density (rows per `range` of time), not the partition size.
  */
case class BandJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    range: Long) extends BinaryNode {

  // The right key always equals the left key — drop it so the output has no
  // ambiguous column name (the usual equi-join USING posture).
  override def output: Seq[Attribute] =
    left.output ++ right.output.filterNot(a => rightKey.semanticEquals(a))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BandJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[BandJoin]] into [[BandJoinExec]]; everything else falls through. */
object BandJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case BandJoin(l, r, lk, rk, lts, rts, range) =>
      BandJoinExec(lk, rk, lts, rts, range, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class BandJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    range: Long,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.filterNot(a => rightKey.semanticEquals(a))

  // numOutputRows sums across tasks; maxBandRows is a size metric (the UI
  // reports min/med/max of the per-task values), each task's value being
  // the largest deque this task ever held — the operator's memory ceiling.
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "maxBandRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createSizeMetric(sparkContext, "max buffered in-band rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  // Rows stream out in the right (late) child's order and placement. Both
  // children are co-partitioned under zipPartitions, so either side's
  // partitioning is true — but only leftKey survives in the output (rightKey
  // is dropped, USING-style), so both advertisements must use SURVIVING
  // attributes or downstream requirements can never match them: the
  // partitioning is the left child's, and the ordering is (leftKey, rightTs)
  // — valid because every emitted row has leftKey == rightKey (inner equi
  // semantics), so the right child's (rightKey, rightTs) stream order IS
  // (leftKey, rightTs) on the output.
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(rightTs, Ascending))
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    require(leftTs.dataType == LongType && rightTs.dataType == LongType,
      "band join timestamps must be LONG (epoch micros/millis)")
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val (lk, lts) = (leftKey, leftTs)
    val (rk, rts) = (rightKey, rightTs)
    val band = range
    val leftOut = left.output
    val rightOut = right.output
    val fullOut = output
    val numOutputRows = longMetric("numOutputRows")
    val maxBandRows = longMetric("maxBandRows")

    left.execute().zipPartitions(right.execute()) { (eIter, lIter) =>
      val eKeyE = BindReferences.bindReference(lk, leftOut)
      val eTsE = BindReferences.bindReference(lts, leftOut)
      val lKeyE = BindReferences.bindReference(rk, rightOut)
      val lTsE = BindReferences.bindReference(rts, rightOut)
      val resultProj = UnsafeProjection.create(fullOut, leftOut ++ rightOut)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // one-row lookahead on the early side
        private var eRow: InternalRow = _
        private var eKeyV: Any = _
        private var eTsV: Long = 0L
        private var eTsNull = false
        private var eValid = false
        advanceEarly()

        // early rows of the current late key, inside the band, ts-ascending.
        // COPIES: buffered rows outlive the child iterator's reused buffer
        // (the spill-reader lesson from AsOfJoinExec).
        private val buf = new ArrayDeque[(Long, InternalRow)]()
        private var bufKey: Any = _

        // current late row being expanded, and how much of buf is emitted
        private var lRow: InternalRow = _
        private var emitIdx = 0
        private var emitEnd = 0

        private def advanceEarly(): Unit = {
          eValid = eIter.hasNext
          if (eValid) {
            eRow = eIter.next()
            eKeyV = eKeyE.eval(eRow)
            val t = eTsE.eval(eRow)
            // explicit null flag, not an in-band sentinel: ts == Long.MinValue
            // is a legitimate value and must still join
            eTsNull = t == null
            eTsV = if (eTsNull) 0L else t.asInstanceOf[Long]
          }
        }

        /** Load the next late row with at least one band partner. */
        private def fill(): Boolean = {
          while (lIter.hasNext) {
            lRow = lIter.next()
            val lKeyV = lKeyE.eval(lRow)
            val lTsVa = lTsE.eval(lRow)
            if (lKeyV != null && lTsVa != null) {
              val lTsV = lTsVa.asInstanceOf[Long]
              // new key group: drop the previous key's buffer
              if (bufKey == null || keyOrd.compare(bufKey, lKeyV) != 0) {
                buf.clear()
                bufKey = InternalRow.copyValue(lKeyV)
              }
              // consume early rows: discard stale keys, buffer current-key
              // rows strictly before this late row's ts
              var continue = eValid
              while (continue) {
                if (eKeyV == null) advanceEarly()
                else {
                  val kc = keyOrd.compare(eKeyV, lKeyV)
                  if (kc < 0) advanceEarly() // keys the late side has passed
                  else if (kc > 0) continue = false
                  else if (eTsNull) advanceEarly() // null ts never matches
                  else if (eTsV < lTsV) {
                    buf.append((eTsV, eRow.copy()))
                    advanceEarly()
                  } else continue = false
                }
                if (!eValid) continue = false
              }
              // evict early rows that fell out of the band. Buffered rows
              // always have eTs < lTsV, so the true gap is positive; if the
              // Long subtraction wraps the gap exceeded Long range and is
              // certainly > band. (`lTsV - band` would itself underflow for
              // timestamps near Long.MinValue.)
              var evicting = true
              while (evicting && buf.nonEmpty) {
                val eTs = buf.head._1
                val gap = lTsV - eTs
                val wrapped = ((lTsV ^ eTs) & (lTsV ^ gap)) < 0
                if (wrapped || gap > band) buf.removeHead() else evicting = false
              }
              if (buf.nonEmpty) {
                if (buf.length > maxBandRows.value) maxBandRows.set(buf.length)
                emitIdx = 0
                emitEnd = buf.length
                return true
              }
            }
          }
          false
        }

        override def hasNext: Boolean = emitIdx < emitEnd || fill()

        override def next(): InternalRow = {
          if (emitIdx >= emitEnd && !fill()) throw new NoSuchElementException
          val e = buf(emitIdx)._2
          emitIdx += 1
          numOutputRows += 1
          resultProj(joined(e, lRow))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BandJoinExec =
    copy(left = newLeft, right = newRight)
}
