package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Expressions

/** Continuous ANN retrieval: a STREAM of query vectors against a static
  * IVF index — the serving half of the similarity-search story (the batch
  * half builds the index; production retrieval then runs as queries
  * arrive).
  *
  * The streaming plan is built so that everything before the final top-k
  * is stateless:
  *  - probe-list selection is a pure EXPRESSION over the (metadata-sized,
  *    collected) centroids — an `array_sort` over literal centroid structs
  *    with a pinned comparator, not a second aggregation, because a
  *    streaming query admits only one stateful aggregate;
  *  - candidate generation is a stream-static join against the inverted
  *    lists (probed lists only — the same candidate set the batch path
  *    scores);
  *  - the per-query top-k is [[graft.functions.TopKByScore]], a mergeable
  *    O(k)-state typed aggregate that is legal in streaming aggregation,
  *    where the batch path's window rank is not.
  *
  * At scale: centroids broadcast (metadata), the static list side is
  * partitioned by `list_id` (the persisted [[graft.operators.IvfIndex]]
  * layout), and each micro-batch of queries touches only its probed
  * lists.
  */
object StreamingAnn {

  /** Top-`nProbe` list ids for a query vector, as a single expression over
    * literal centroids: score all, `array_sort` with sim-desc / id-asc
    * comparator (same tie-break as the batch `probeLists` window), slice. */
  private[graft] def probesExpr(centroids: Seq[(Long, Seq[Double])], qv: Column,
      nProbe: Int): Column = {
    val scored = array(centroids.map { case (id, cv) =>
      struct(Expressions.cosineSim(qv, array(cv.map(lit): _*)).as("sim"),
             lit(id).as("list_id"))
    }: _*)
    val sorted = array_sort(scored, (l: Column, r: Column) =>
      when(l("sim") > r("sim"), -1).when(l("sim") < r("sim"), 1)
        .otherwise(when(l("list_id") < r("list_id"), -1)
          .when(l("list_id") > r("list_id"), 1).otherwise(0)))
    slice(sorted, 1, nProbe)
  }

  /** `queryStream` (streaming, columns `query_id`, `qv`) → one row per
    * query with its running top-k `[(neighbor_id, sim), ...]` against the
    * static `lists` frame (columns `vec_id`, `v`, `list_id`). Run with
    * update/complete output mode; each micro-batch refines the answer as
    * its candidates arrive. */
  def knnStream(queryStream: DataFrame, lists: DataFrame,
      centroids: Seq[(Long, Seq[Double])], k: Int = 5, nProbe: Int = 4): DataFrame = {
    val s = queryStream.sparkSession
    import s.implicits._
    val topK = udaf(new graft.functions.TopKByScore(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    val probed = queryStream
      .select($"query_id", $"qv",
              explode(probesExpr(centroids, $"qv", nProbe)).as("p"))
      .select($"query_id", $"qv", $"p.list_id".as("list_id"))
    probed.join(lists, Seq("list_id"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id",
              Expressions.cosineSim($"qv", $"v").as("sim"),
              $"vec_id".as("neighbor_id"))
      .groupBy($"query_id")
      .agg(topK($"sim", $"neighbor_id").as("topk"))
  }
}
