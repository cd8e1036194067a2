package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (SURVEY.md §2.B "UDF/UDAF/UDTF"): a bounded
  * top-k aggregator over (score, id) pairs.
  *
  * Why an aggregator and not a window: `row_number().over(partitionBy
  * (g).orderBy(score))` SORTS every group in full; this buffer keeps
  * only k entries per group through partial aggregation — map-side
  * combine ships at most k rows per group per partition through the
  * shuffle, the per-group equivalent of TakeOrderedAndProject. For
  * k ≪ group size this is the only shape that survives groups of
  * billions.
  *
  * Buffer is a sorted-descending Seq capped at k (product-encodable;
  * insertion keeps it sorted so reduce/merge are O(k)). Ties break by
  * id ascending — deterministic.
  */
final class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k >= 1)

  override def zero: Seq[(Double, Long)] = Vector.empty

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.size == k && !better(x, buf.last)) buf
    else {
      val i = buf.indexWhere(e => better(x, e)) match {
        case -1 => buf.size
        case n => n
      }
      (buf.patch(i, Seq(x), 0)).take(k)
    }
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}

object TopKAgg {

  /** Column form: `topK(k)(struct-less score, id)` usable in
    * groupBy().agg(...). Returns array<struct<_1 double, _2 bigint>>
    * sorted best-first.
    */
  def topK(k: Int): (Column, Column) => Column = {
    val agg = udaf(new TopKAgg(k))
    (score, id) => agg(score, id)
  }
}
