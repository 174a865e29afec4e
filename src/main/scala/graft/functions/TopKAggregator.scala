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
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size >= k && better(buf.last, x)) buf
    else {
      val i = buf.indexWhere(e => better(x, e))
      val at = if (i < 0) buf.size else i
      (buf.take(at) :+ x) ++ buf.drop(at).take(k - at - 1)
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
