package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic uniform group sampling as a one-pass typed aggregate:
  * keep the k ids whose hash strings sort lowest ("bottom-k by hash").
  *
  * Because the hash is a pure function of the id, the sample is (a)
  * uniform (hash order is independent of data order), (b) deterministic
  * across runs/engines (an md5-ordered window in any engine produces the
  * same set — which is what makes it oracle-checkable), and (c) mergeable:
  * partial bottom-k lists combine associatively, so Spark runs it as a
  * map-side partial + merge aggregate — one pass over 100 TB, O(k) state
  * per group, versus the sort-the-whole-group window formulation.
  */
class BottomKByHash(k: Int)
    extends Aggregator[(String, Long), List[(String, Long)], Seq[Long]] {

  override def zero: List[(String, Long)] = Nil

  private def insert(buf: List[(String, Long)], x: (String, Long)): List[(String, Long)] = {
    val merged = (x :: buf).sortBy(e => (e._1, e._2))
    if (merged.size > k) merged.take(k) else merged
  }

  override def reduce(buf: List[(String, Long)], in: (String, Long)): List[(String, Long)] =
    insert(buf, in)

  override def merge(a: List[(String, Long)], b: List[(String, Long)]): List[(String, Long)] =
    (a ++ b).sortBy(e => (e._1, e._2)).take(k)

  override def finish(buf: List[(String, Long)]): Seq[Long] = buf.map(_._2)

  override def bufferEncoder: Encoder[List[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(String, Long)]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
