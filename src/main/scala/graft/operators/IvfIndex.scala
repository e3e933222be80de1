package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index — the "build once, query many" ANN serving shape.
  *
  * `build` trains the coarse quantizer (same seeds + Lloyd refinement as
  * [[Similarity.knnIvf]]) and writes the inverted lists as parquet
  * **partitioned by `list_id`**, centroids alongside. `query` reads the
  * centroids (nLists tiny rows), picks each query's nProbe nearest lists,
  * and scans ONLY those list directories — the probe set becomes a
  * partition filter, so at 100 TB a query touches `nProbe/nLists` of the
  * index bytes at the *filesystem* level (directory pruning), not just
  * after a full scan. This is the operational difference between the
  * inline `knnIvf` (index rebuilt per query) and a production vector
  * store.
  */
object IvfIndex {

  /** Train the quantizer over `embeddings` at `d` and write the index. */
  def build(s: SparkSession, d: String, indexDir: String, nLists: Int = 16,
      lloydIters: Int = Similarity.DefaultLloydIters): Unit = {
    import s.implicits._
    val vecs = graft.Tables.embeddings(s, d)
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    val centroids = Similarity.lloydCentroids(vecs, nLists, lloydIters)
    centroids.coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")
    Similarity.coarseAssign(vecs, centroids)
      .write.mode("overwrite")
      .partitionBy("list_id")
      .parquet(s"$indexDir/lists")
  }

  /** Append a new vector batch to a built index WITHOUT retraining — the
    * ingest shape (cf. [[Dedup.exactIncremental]]): the saved centroids
    * are the frozen quantizer, the batch is assigned against them in one
    * broadcast map pass, and the new rows land in their `list_id=`
    * directories via dynamic-partition append. Query cost and pruning are
    * unchanged; recall degrades only as the corpus drifts from the
    * centroids' training distribution (rebuild cadence is an operational
    * choice, exactly as in production vector stores). `newVecs` must have
    * columns `(vec_id, v: array<double>)`. */
  def append(s: SparkSession, indexDir: String, newVecs: DataFrame): Unit = {
    val centroids = s.read.parquet(s"$indexDir/centroids")
    Similarity.coarseAssign(newVecs, centroids)
      .write.mode("append")
      .partitionBy("list_id")
      .parquet(s"$indexDir/lists")
  }

  /** Top-k per query vector against a built index. `queries` must have
    * columns `(query_id, qv: array<double>)`. */
  def query(s: SparkSession, indexDir: String, queries: DataFrame,
      k: Int = 5, nProbe: Int = 4): DataFrame = {
    import s.implicits._
    val centroids = s.read.parquet(s"$indexDir/centroids")
    val probes = Similarity.probeLists(queries, centroids, nProbe)
    // the probed list ids are query metadata (≤ nQueries×nProbe values) —
    // collecting them turns the probe set into a partition filter the
    // parquet source prunes at directory level
    val probedIds = probes.select($"list_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    val lists = s.read.parquet(s"$indexDir/lists")
      .filter($"list_id".isin(probedIds: _*))
    val cand = lists.join(probes, Seq("list_id"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
              graft.functions.Expressions.cosineSim($"qv", $"v").as("sim"))
    Similarity.rankWithin(cand, k)
  }
}
