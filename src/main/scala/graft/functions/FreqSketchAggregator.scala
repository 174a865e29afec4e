package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries frequent-items sketch as a typed `Aggregator`: a fixed budget
  * of `k` counters per buffer, with the classic guarantees
  *
  *   - every item with true frequency > n/(k+1) is present in the output;
  *   - each reported estimate undercounts its true frequency by at most
  *     n/(k+1) (n = rows aggregated).
  *
  * Why a sketch when d10 computes exact top-100: the exact path shuffles one
  * row per DISTINCT item — at web-corpus vocabulary sizes that is billions
  * of rows through two aggregation levels. This buffer is O(k) per partial,
  * reduces map-side, and `merge` is the standard MG combine (sum counters,
  * then subtract the (k+1)-largest value and drop non-positives), which
  * preserves both guarantees under arbitrary merge trees — exactly the
  * mergeability that makes it safe on any partitioning at 100 TB.
  *
  * Estimates (not just membership) depend on the merge order, so outputs are
  * deterministic per physical plan but not across partitionings — the
  * registry face (d23) therefore reports only items above the guarantee
  * threshold, and `FreqSketchSpec` checks the guarantees against exact
  * counts rather than pinning sketch internals.
  */
class FreqSketchAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    // SQL-aggregate null semantics: skip null items — counting them would
    // put a null KEY in the buffer map, which the encoder rejects at the
    // first partial-buffer serialization
    if (item == null) b else b.get(item) match {
      case Some(c) => b.updated(item, c + 1)
      case None if b.size < k => b.updated(item, 1L)
      case None => // decrement-all step: drop counters that hit zero
        b.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
    }

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val combined = b2.foldLeft(b1) { case (acc, (i, c)) =>
      acc.updated(i, acc.getOrElse(i, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      // subtract the (k+1)-th largest counter from everything, drop <= 0
      val kth = combined.values.toSeq.sorted(Ordering[Long].reverse)(k)
      combined.flatMap { case (i, c) => if (c > kth) Some(i -> (c - kth)) else None }
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Map[String, Long]] = bufferEncoder
}

object FreqSketchAggregator {
  /** `freqSketch(k)(itemCol)` → map<string, bigint> of ≤ k surviving
    * counters (Misra–Gries estimates; see class doc for the guarantees). */
  def freqSketch(k: Int): Column => Column = {
    val fn = udaf(new FreqSketchAggregator(k), Encoders.STRING)
    item => fn(item)
  }
}
