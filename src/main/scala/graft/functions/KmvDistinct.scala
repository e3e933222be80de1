package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a one-pass mergeable
  * typed aggregate (Bar-Yossef et al., "Counting distinct elements in a
  * data stream"; the classic theta-sketch special case).
  *
  * State is the k smallest DISTINCT 60-bit hashes seen per group — O(k)
  * and associatively mergeable, so Spark runs map-side partials and
  * shuffles at most k longs per group regardless of corpus size. The
  * estimate is `(k-1) / u_(k)` with `u_(k)` the k-th smallest hash
  * normalized to [0,1); below k distinct hashes the count is exact.
  *
  * Unlike HLL (whose register layout is engine-internal, making q21's
  * sketch columns tolerance-gated), KMV over the replayable md5-fold hash
  * ([[Expressions.Sketch]]) is a pure function of the value set: any
  * engine that sorts the same 60-bit folds produces the SAME estimate
  * bit-for-bit, so the sketch output itself is oracle-hash-checkable.
  * The cast of a >2^53 hash to double rounds nearest-even identically on
  * both engines; 255·2^60 is exactly representable, so the division is
  * one IEEE op with identical operands.
  */
class KmvDistinct(k: Int) extends Aggregator[Long, List[Long], Double] {

  /** 2^60 as an exact double — hashes are 60-bit folds. */
  private val Norm = 1152921504606846976L.toDouble

  /** Buffer invariant: the k smallest distinct hashes in DESCENDING
    * order, so `head` is the k-th smallest — the admission threshold.
    * That makes the hot path O(1): once the buffer is full, a row whose
    * hash ≥ head (the overwhelming majority after warm-up — the
    * admission probability of the i-th distinct value is k/i) is
    * rejected without touching the list. Only admitted hashes pay the
    * O(k) dedup + re-sort. */
  override def zero: List[Long] = Nil

  override def reduce(buf: List[Long], h: Long): List[Long] =
    if (buf.nonEmpty && buf.size >= k && h >= buf.head) buf // fast reject
    else if (buf.contains(h)) buf
    else {
      val merged = (h :: buf).sortWith(_ > _)
      if (merged.size > k) merged.tail else merged
    }

  override def merge(a: List[Long], b: List[Long]): List[Long] =
    (a ++ b).distinct.sortWith(_ > _).takeRight(k)

  override def finish(buf: List[Long]): Double =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * Norm / buf.head.toDouble

  override def bufferEncoder: Encoder[List[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()
  override def outputEncoder: Encoder[Double] =
    org.apache.spark.sql.Encoders.scalaDouble
}

/** [[KmvDistinct]]'s state as the RESULT: the k smallest distinct hashes,
  * ascending. The raw sketch (not just its cardinality estimate) is what
  * set-OPERATION estimators need — two groups' sketches merge into the
  * union's sketch, and the fraction of merged values present in both
  * inputs estimates Jaccard (the theta-sketch intersection rule). Same
  * O(k) mergeable buffer; the output is a pure function of the value set,
  * so it is oracle-hash-checkable like the estimate. */
class KmvSketch(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {
  private val inner = new KmvDistinct(k)
  override def zero: List[Long] = inner.zero
  override def reduce(buf: List[Long], h: Long): List[Long] = inner.reduce(buf, h)
  override def merge(a: List[Long], b: List[Long]): List[Long] = inner.merge(a, b)
  override def finish(buf: List[Long]): Seq[Long] = buf.reverse // ascending
  override def bufferEncoder: Encoder[List[Long]] = inner.bufferEncoder
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
