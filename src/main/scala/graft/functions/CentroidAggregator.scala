package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`: running (sum-vector, count) for fixed-dimension
  * float embeddings, finishing to the mean vector.
  *
  * This is the `Aggregator[IN, BUF, OUT]` extension tier from
  * SURVEY.md §7.4 — partial buffers merge associatively, so Spark runs
  * it map-side first and only ships one (dim+1)-double buffer per
  * (group × partition) through the shuffle: constant-size state no
  * matter how many vectors a group holds.
  */
class CentroidAggregator(dim: Int)
    extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    val (sums, n) = b
    var i = 0
    while (i < dim && i < v.length) { sums(i) += v(i); i += 1 }
    (sums, n + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    val (sx, nx) = x; val (sy, ny) = y
    var i = 0
    while (i < dim) { sx(i) += sy(i); i += 1 }
    (sx, nx + ny)
  }

  override def finish(b: (Array[Double], Long)): Array[Double] = {
    val (sums, n) = b
    if (n == 0) sums else sums.map(_ / n)
  }

  // Product ExpressionEncoder: the buffer ships through the shuffle as
  // an unsafe-row (array<double>, bigint) — no Java serialization.
  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoderHelp.buffer
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoderHelp.doubleArray
}

private object ExpressionEncoderHelp {
  val doubleArray: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  val buffer: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
}
