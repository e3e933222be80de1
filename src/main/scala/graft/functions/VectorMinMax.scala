package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Partial state of [[VectorMinMax]]: element-wise mins and maxs. */
case class VecMinMaxBuf(var mins: Array[Double], var maxs: Array[Double])

/** Element-wise min/max of `array<double>` vectors as one mergeable pass —
  * the per-dimension range statistic scalar quantization needs
  * ([[graft.operators.Similarity.knnSq8]]). Same shape as [[VectorAvg]]:
  * whole vectors reduce map-side to one `(mins, maxs)` state per
  * partition, O(partitions) states cross the wire, and min/max are exact
  * (no summation-order concerns at all). */
class VectorMinMax extends Aggregator[Seq[Double], VecMinMaxBuf, VecMinMaxBuf] {

  override def zero: VecMinMaxBuf =
    VecMinMaxBuf(Array.emptyDoubleArray, Array.emptyDoubleArray)

  override def reduce(b: VecMinMaxBuf, v: Seq[Double]): VecMinMaxBuf = {
    if (v == null) return b
    if (b.mins.isEmpty) { b.mins = v.toArray; b.maxs = v.toArray; return b }
    require(b.mins.length == v.length,
      s"vector length mismatch: ${b.mins.length} vs ${v.length}")
    var i = 0
    while (i < v.length) {
      if (v(i) < b.mins(i)) b.mins(i) = v(i)
      if (v(i) > b.maxs(i)) b.maxs(i) = v(i)
      i += 1
    }
    b
  }

  override def merge(a: VecMinMaxBuf, b: VecMinMaxBuf): VecMinMaxBuf = {
    if (b.mins.isEmpty) a
    else if (a.mins.isEmpty) b
    else {
      var i = 0
      while (i < a.mins.length) {
        if (b.mins(i) < a.mins(i)) a.mins(i) = b.mins(i)
        if (b.maxs(i) > a.maxs(i)) a.maxs(i) = b.maxs(i)
        i += 1
      }
      a
    }
  }

  override def finish(b: VecMinMaxBuf): VecMinMaxBuf = b

  override def bufferEncoder: Encoder[VecMinMaxBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[VecMinMaxBuf]()
  override def outputEncoder: Encoder[VecMinMaxBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[VecMinMaxBuf]()
}
