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

  /** Health manifest of a PERSISTED index (the operational twin of
    * [[Similarity.ivfHealth]], which derives it from the raw corpus):
    * reads the frozen centroids + the physical `list_id=` directories,
    * re-scores each stored vector against its own centroid, and emits
    * the same per-list stats / skew / drift / retrain columns, with
    * "base vs appended" split on `vec_id < cut` (the ingest convention
    * of [[append]]). IvfHealthSpec asserts it row-equals the inline
    * derivation when the index was built with the same cut. */
  def health(s: SparkSession, indexDir: String, cut: Long,
      nLists: Int = 16): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    import graft.functions.Expressions
    // stored assignment is authoritative (list_id partition column); the
    // sim is re-derived against that list's centroid via a broadcast of
    // the nLists-row quantizer table
    val lists = s.read.parquet(s"$indexDir/lists")
      .join(broadcast(s.read.parquet(s"$indexDir/centroids")), "list_id")
      .select($"vec_id", $"list_id",
        Expressions.cosineSim($"v", $"cv").as("sim"))
      .select($"vec_id", $"list_id",
        expr("CAST(round(sim * 1000000) AS BIGINT)").as("sim_micro"))
    val perList = lists.groupBy($"list_id")
      .agg(sum(when($"vec_id" < cut, 1L).otherwise(0L)).as("n_base"),
           sum(when($"vec_id" >= cut, 1L).otherwise(0L)).as("n_new"),
           sum(when($"vec_id" < cut, $"sim_micro")).as("base_sum"),
           sum(when($"vec_id" >= cut, $"sim_micro")).as("new_sum"))
    val tot = perList.agg(
      sum($"n_base" + $"n_new").as("n_total"),
      max($"n_base" + $"n_new").as("max_list"),
      sum($"base_sum").as("tb"), sum($"n_base").as("nb"),
      sum($"new_sum").as("tn"), sum($"n_new").as("nn"))
    perList.crossJoin(broadcast(tot)).select(
        $"list_id", $"n_base", $"n_new",
        expr("CASE WHEN n_base > 0 THEN base_sum div n_base END").as("base_sim_micro"),
        expr("CASE WHEN n_new > 0 THEN new_sum div n_new END").as("new_sim_micro"),
        expr("CAST(1000000 * (n_base + n_new) div n_total AS BIGINT)").as("share_micro"),
        expr(s"max_list * $nLists > 2 * n_total").as("skew_alarm"),
        expr(s"CASE WHEN nb > 0 AND nn > 0 THEN tb div nb - tn div nn >= ${Similarity.IvfDriftMicro} ELSE false END")
          .as("drift_alarm"))
      .withColumn("retrain", $"skew_alarm" || $"drift_alarm")
      .orderBy($"list_id")
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
