package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k by score as a one-pass typed aggregate: keep the k
  * (score, id) entries with the highest score, ties broken by lowest id.
  *
  * The window-rank formulation ([[graft.operators.Similarity]]'s
  * `rankWithin`) sorts every candidate row inside a shuffle; this
  * aggregator is the streaming-safe and map-side-combinable alternative:
  * partial top-k lists merge associatively, so Spark keeps O(k) state per
  * group, and — unlike a window — it is legal inside a Structured
  * Streaming aggregation, which is what [[graft.streaming.StreamingAnn]]
  * needs for continuous retrieval.
  *
  * Determinism: the kept set and its order are a pure function of the
  * input SET (sort by score desc, id asc at every insert/merge), never of
  * arrival or partition order.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Long, Double)]] {

  override def zero: List[(Double, Long)] = Nil

  private def trim(l: List[(Double, Long)]): List[(Double, Long)] =
    l.sortBy(e => (-e._1, e._2)).take(k)

  override def reduce(buf: List[(Double, Long)], in: (Double, Long)): List[(Double, Long)] =
    trim(in :: buf)

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    trim(a ++ b)

  /** Highest score first; (neighbor id, score) pairs. */
  override def finish(buf: List[(Double, Long)]): Seq[(Long, Double)] =
    buf.map { case (s, id) => (id, s) }

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}
