package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` for the PCA moment pass: one corpus scan
  * accumulates the upper triangle of Σ x·xᵀ, the vector sum Σ x, and
  * the row count — everything the covariance matrix
  * C = E[xxᵀ] − μμᵀ needs — in ONE constant-size buffer
  * (dim·(dim+1)/2 + dim doubles ≈ 17 KB at dim 64).
  *
  * Same §7.4 extension tier as [[CentroidAggregator]]: partials merge
  * associatively, Spark combines map-side, and the shuffle carries one
  * buffer per partition regardless of corpus size. Products of float
  * components are exact in double (24+24 ≤ 53 mantissa bits); only the
  * cross-row accumulation is order-sensitive, which the consumer
  * handles by rounding the finished covariance entries before the
  * eigensolve (the q_embed_centroid interchange discipline).
  *
  * finish() lays out the buffer flat: [tri(0..T-1) ++ sums(0..dim-1)
  * ++ n], T = dim·(dim+1)/2, so the driver reads one Array[Double].
  */
class GramAggregator(dim: Int)
    extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  private val tri = dim * (dim + 1) / 2

  override def zero: (Array[Double], Long) =
    (new Array[Double](tri + dim), 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    val (acc, n) = b
    // fail fast on width drift: silently zero-padding/truncating a
    // malformed embedding would skew the covariance (and the PCA
    // basis) with no signal at all
    require(v.length == dim,
      s"embedding width ${v.length} != aggregator dim $dim")
    val m = dim
    var i = 0
    while (i < m) {
      val xi = v(i).toDouble
      // row i's triangle entries start at i*dim - i*(i-1)/2; entry
      // (i, j) sits at that start + (j - i)
      val base = i * dim - i * (i - 1) / 2 - i
      var j = i
      while (j < m) {
        acc(base + j) += xi * v(j).toDouble
        j += 1
      }
      acc(tri + i) += xi
      i += 1
    }
    (acc, n + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    val (ax, nx) = x; val (ay, ny) = y
    var i = 0
    while (i < ax.length) { ax(i) += ay(i); i += 1 }
    (ax, nx + ny)
  }

  override def finish(b: (Array[Double], Long)): Array[Double] = {
    val (acc, n) = b
    acc :+ n.toDouble
  }

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
