package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact distributed top-k as a typed `Aggregator` (SURVEY.md §2.10's
  * optional UDAF surface, done the Dataset-typed way): per group, keep the k
  * largest (score, id) pairs with the id as a deterministic tie-break.
  *
  * Why an aggregator instead of a ranking window: the window formulation
  * sorts EVERY row of the group; this buffer holds at most k entries, the
  * partial aggregation runs map-side (each task reduces its rows to k before
  * the shuffle), and `merge` combines two k-buffers — so shuffle volume per
  * group is O(k), not O(rows). That is the TakeOrdered idea made available
  * inside any `groupBy`.
  *
  * The buffer is an insertion-sorted Vector capped at k (descending score,
  * ascending id): reduce is O(k) per row, merge O(k). For the k ~ tens this
  * is built for, that beats heap constant factors inside Tungsten.
  *
  * Inputs must be NON-NULL (scores and ids): the primitive tuple encoder
  * rejects nulls at deserialization — filter or coalesce nullable columns
  * before aggregating, the same precondition as AsOf's tieBreak.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, s"top-k needs k >= 1, got $k")

  // java.lang.Double.compare is a TOTAL order (NaN greatest, -0.0 < 0.0) —
  // the order Spark's own sort uses. A `>`/`==` comparison instead would
  // let NaN scores fall through every strict test and append past the k
  // cap, growing the buffer with the group.
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  private def insert(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] = {
    // position = after every strictly-better element; exact duplicates
    // insert ADJACENT to their twin (two identical rows legitimately hold
    // two of the k slots, like rn=1,2 in the window formulation), and the
    // final take(k) is what caps the buffer — size can never exceed k.
    val at = buf.indexWhere(e => !better(e, x)) match {
      case -1 => buf.size
      case p => p
    }
    if (at >= k) buf
    else ((buf.take(at) :+ x) ++ buf.drop(at)).take(k)
  }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    insert(b, a)

  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b2.foldLeft(b1)(insert)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    bufferEncoder
}

object TopKAggregator {
  /** `topK(k)(scoreCol, idCol)` → array<struct<_1: double, _2: bigint>> of
    * the k largest scores, ties broken by the smaller id. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAggregator(k), Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    (score, id) => fn(score, id)
  }
}
