package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`: bounded top-k of (value, id) pairs per group,
  * ordered by value DESC then id ASC.
  *
  * This is the scale-first alternative to the window-rank top-k
  * (`row_number() OVER (PARTITION BY g ORDER BY v) <= k`): the window
  * form SORTS every group's full row set; this aggregator keeps a
  * k-element buffer per (group × partition), merges buffers
  * associatively, and ships at most k rows per group through the
  * shuffle — at 100 TB the state is O(groups × k) no matter how many
  * rows a group holds, and the partial (map-side) pass discards
  * everything below each partition's local top-k before any exchange.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Nil

  private def insert(buf: Seq[(Double, Long)], v: (Double, Long)): Seq[(Double, Long)] =
    if (buf.length >= k && !better(v, buf.last)) buf
    else {
      val (pre, post) = buf.span(better(_, v))
      (pre ++ (v +: post)).take(k)
    }

  override def reduce(buf: Seq[(Double, Long)], v: (Double, Long)): Seq[(Double, Long)] =
    insert(buf, v)

  override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
    y.foldLeft(x)(insert)

  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b

  // Product ExpressionEncoder: the buffer crosses the shuffle as an
  // unsafe-row array<struct<double,bigint>> — no Java serialization.
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = TopKAggregator.enc
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = TopKAggregator.enc
}

private object TopKAggregator {
  val enc: Encoder[Seq[(Double, Long)]] = ExpressionEncoder[Seq[(Double, Long)]]()
}
