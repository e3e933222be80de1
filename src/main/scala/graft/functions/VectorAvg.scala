package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mutable partial state of [[VectorAvg]]: element-wise sums + count. */
case class VecAvgBuf(var sums: Array[Double], var n: Long)

/** Element-wise mean of `array<double>` vectors as a one-pass mergeable
  * aggregate — the scale-safe centroid computation for the IVF/k-means
  * build ([[graft.operators.Similarity.lloydCentroids]]).
  *
  * The alternative formulation (`posexplode` + `groupBy(list, pos)` +
  * re-collect) shuffles `dims` rows per vector — 64× the corpus row count
  * just to average centroids, which dominates the index *build* at 100 TB.
  * This aggregate keeps whole vectors in the map pass and reduces them to
  * one `(sums, n)` state per (partition × list): partial states combine
  * associatively, so what crosses the wire is O(partitions × lists)
  * buffers, independent of corpus size — the same shape that makes
  * [[BottomKByHash]] one-pass.
  */
class VectorAvg extends Aggregator[Seq[Double], VecAvgBuf, Seq[Double]] {

  override def zero: VecAvgBuf = VecAvgBuf(Array.emptyDoubleArray, 0L)

  private def addInto(acc: Array[Double], v: Seq[Double]): Unit = {
    require(acc.length == v.length,
      s"vector length mismatch: ${acc.length} vs ${v.length}")
    var i = 0
    while (i < acc.length) { acc(i) += v(i); i += 1 }
  }

  override def reduce(b: VecAvgBuf, v: Seq[Double]): VecAvgBuf = {
    if (v == null) return b
    if (b.n == 0L) { b.sums = v.toArray; b.n = 1L }
    else { addInto(b.sums, v); b.n += 1L }
    b
  }

  override def merge(a: VecAvgBuf, b: VecAvgBuf): VecAvgBuf = {
    if (b.n == 0L) a
    else if (a.n == 0L) b
    else { addInto(a.sums, b.sums.toSeq); a.n += b.n; a }
  }

  override def finish(b: VecAvgBuf): Seq[Double] =
    if (b.n == 0L) null else b.sums.map(_ / b.n).toSeq

  override def bufferEncoder: Encoder[VecAvgBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[VecAvgBuf]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
