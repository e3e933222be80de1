package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables._
import graft.functions.Expressions
import graft.plans.Caching

/** Semantic (embedding-space) curation over the `embeddings` table:
  * cluster-then-compare deduplication and per-cluster prototype selection.
  *
  * Both operators share the IVF coarse quantizer
  * ([[Similarity.lloydCentroids]]): the corpus is partitioned into
  * `nLists` Lloyd-refined clusters, and ALL pairwise work happens inside a
  * cluster. That is the scale contract — the quadratic comparison that
  * makes naive semantic dedup intractable is bounded by the largest
  * cluster, not the corpus: with balanced lists each cluster holds ~n/L
  * vectors and the candidate pair count drops from n²/2 to n²/(2L). At
  * 100 TB you raise `nLists` with the corpus (lists of ~100k vectors keep
  * the per-cluster join trivially memory-resident) and cap outliers with
  * the same bounded-bucket argument StressSpec asserts for LSH/simhash.
  *
  * SemDeDup (Abbas et al., arXiv:2303.09540) keeps one representative per
  * group of near-identical embeddings: inside each cluster, a vector is
  * dropped when a lower-id vector sits within the cosine threshold.
  * Prototype selection (the "SSL prototypes" curation rule, Sorscher et
  * al., arXiv:2206.14486) ranks each cluster's members by centroid
  * similarity and keeps the `m` most prototypical.
  */
object Semantic {

  val DefaultLists = 16

  /** Member cap above which a cluster is deterministically hash-sharded
    * before the within-cluster pair join. The quadratic comparison is
    * bounded by the LARGEST cluster, and a degenerate corpus (near-
    * constant embeddings — common in scraped data: empty pages, boiler-
    * plate) can funnel everything into one mega-cluster where n²/2 pairs
    * blow up regardless of `nLists`. A second Lloyd pass cannot split
    * that case (k-means cannot separate identical points), so the cap
    * shards by `xxhash64(vec_id) mod ceil(size/cap)` — balanced by id
    * hashing, independent of vector geometry. Drops stay SOUND (anything
    * dropped has a τ-close lower-id twin in its shard); recall of drops
    * degrades gracefully: at most one extra representative survives per
    * shard (≤ ceil(size/cap) per cluster instead of 1 in the fully
    * degenerate case). Default is inert at oracle scale (largest fixture
    * cluster « cap), so the DuckDB replay stays exact; StressSpec pins
    * the capped path on a planted mega-cluster. */
  val DefaultMaxClusterSize = 100000

  /** Cosine threshold for "semantically identical". The synthetic
    * embeddings' pairwise cosine mass sits in [-0.5, 0.5]; 0.4 selects the
    * far tail (top ~0.2% of pairs), the same regime a production tau
    * (0.95+ on real embeddings) occupies. */
  val DefaultTau = 0.4

  /** Cluster assignment reused by both operators: the trained quantizer's
    * final assignment, persisted because both consumers fork over it
    * (self-join / centroid re-join). Callers free via the returned thunk
    * ([[graft.plans.Caching.detach]] discipline). */
  private def clusteredVecs(s: SparkSession, d: String, nLists: Int,
      lloydIters: Int): (DataFrame, DataFrame, () => Unit) = {
    import s.implicits._
    val vecs = embeddings(s, d)
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    val centroids = Similarity.lloydCentroids(vecs, nLists, lloydIters)
    val lists = Caching.iterCheckpoint(Similarity.coarseAssign(vecs, centroids))
    (lists, centroids, () => Caching.freeCheckpoint(lists))
  }

  /** SemDeDup: `(vec_id, list_id, keep)` for every corpus vector — `keep`
    * is false iff a lower-id vector in the same cluster has cosine ≥ `tau`
    * (round-4-digit first, the same boundary discipline as the embedding
    * near-dup pair queries, so the ≥ comparison is engine-stable).
    *
    * The self-join is equi-keyed on `(list_id, sub_id)` — the cluster id
    * plus the mega-cluster shard of [[capClusters]] — so it shuffles each
    * bucket to one task and compares only within it; the dup side
    * collapses to a DISTINCT id set before the corpus-wide left-anti flag
    * join. */
  def semanticDedup(s: SparkSession, d: String,
      nLists: Int = DefaultLists,
      lloydIters: Int = Similarity.DefaultLloydIters,
      tau: Double = DefaultTau,
      maxClusterSize: Int = DefaultMaxClusterSize): DataFrame = {
    import s.implicits._
    val (lists, _, free) = clusteredVecs(s, d, nLists, lloydIters)
    Caching.detach(semanticDedupFrom(lists, tau, maxClusterSize), free)
  }

  /** Shard any cluster larger than `cap` into `ceil(size/cap)` sub-buckets
    * by id hash (see [[DefaultMaxClusterSize]]); clusters at or under the
    * cap keep a single `sub_id = 0` bucket, so the capped plan is
    * semantically identical to the uncapped one until a cluster actually
    * exceeds the cap. Cluster sizes are an nLists-row aggregate —
    * broadcast, no extra corpus shuffle. */
  private[graft] def capClusters(lists: DataFrame, cap: Int): DataFrame = {
    val s = lists.sparkSession
    import s.implicits._
    val sizes = lists.groupBy($"list_id").agg(count(lit(1)).as("cl_n"))
    lists.join(broadcast(sizes), Seq("list_id"))
      .withColumn("n_sub", greatest(lit(1L), ceil($"cl_n" / lit(cap.toDouble)).cast("long")))
      .withColumn("sub_id", pmod(xxhash64($"vec_id"), $"n_sub"))
      .drop("cl_n", "n_sub")
  }

  /** The SemDeDup core over an already-clustered frame `(vec_id, list_id,
    * v)`: within each (cluster, shard) bucket, a vector is dropped when a
    * lower-id vector sits within the cosine threshold. Candidate pairs
    * are bounded by Σ_buckets c²/2 ≤ corpus · cap — never the
    * uncapped largest-cluster quadratic. */
  private[graft] def semanticDedupFrom(lists: DataFrame, tau: Double = DefaultTau,
      maxClusterSize: Int = DefaultMaxClusterSize): DataFrame = {
    val s = lists.sparkSession
    import s.implicits._
    val dup = semanticDupIdsFrom(lists, tau, maxClusterSize)
    lists
      .join(dup.withColumn("is_dup", lit(true)), Seq("vec_id"), "left")
      .select($"vec_id", $"list_id", $"is_dup".isNull.as("keep"))
      .orderBy($"vec_id")
  }

  /** The DISTINCT dropped vec_ids of [[semanticDedupFrom]] — factored so
    * a consumer that only needs the DROP SET (the e2e curation chain's
    * stage 5) skips the corpus-wide keep-flag join, the output sort and
    * the corpus-sized detach of the full manifest. Same clustered frame,
    * same pair predicate ⇒ the id set is identical to
    * `semanticDedupFrom(lists).filter(!keep)` by construction. */
  private[graft] def semanticDupIdsFrom(lists: DataFrame,
      tau: Double = DefaultTau,
      maxClusterSize: Int = DefaultMaxClusterSize): DataFrame = {
    val capped = capClusters(lists, maxClusterSize)
    capped.as("a").join(capped.as("b"),
        col("a.list_id") === col("b.list_id") &&
          col("a.sub_id") === col("b.sub_id") &&
          col("a.vec_id") < col("b.vec_id"))
      .filter(round(Expressions.cosineSim(col("a.v"), col("b.v")), 4) >= tau)
      .select(col("b.vec_id").as("vec_id")).distinct()
  }

  /** [[semanticDupIdsFrom]] from the raw tables, detached (the drop set
    * is pair-threshold-bounded, so the local-relation path applies). */
  private[operators] def semanticDropIds(s: SparkSession, d: String,
      nLists: Int = DefaultLists,
      lloydIters: Int = Similarity.DefaultLloydIters,
      tau: Double = DefaultTau,
      maxClusterSize: Int = DefaultMaxClusterSize): DataFrame = {
    val (lists, _, free) = clusteredVecs(s, d, nLists, lloydIters)
    Caching.detach(semanticDupIdsFrom(lists, tau, maxClusterSize), free)
  }

  /** Per-cluster prototypes: the `m` members most similar to their
    * cluster's trained centroid — `(list_id, vec_id, proto_rank,
    * cos_sim)`. Centroids are collected index metadata (nLists × dims
    * doubles), so the scoring join is a broadcast and the rank window is
    * partitioned by cluster — no global sort anywhere. */
  def prototypes(s: SparkSession, d: String,
      nLists: Int = DefaultLists,
      lloydIters: Int = Similarity.DefaultLloydIters,
      m: Int = 3): DataFrame = {
    import s.implicits._
    val (lists, centroids, free) = clusteredVecs(s, d, nLists, lloydIters)
    val scored = lists.join(broadcast(centroids), Seq("list_id"))
      .select($"list_id", $"vec_id",
              Expressions.cosineSim($"v", $"cv").as("sim"))
    val w = Window.partitionBy($"list_id").orderBy($"sim".desc, $"vec_id")
    val out = scored.withColumn("rk", row_number().over(w))
      .filter($"rk" <= m)
      .select($"list_id", $"vec_id", $"rk".cast("long").as("proto_rank"),
              round($"sim", 6).as("cos_sim"))
      .orderBy($"list_id", $"proto_rank")
    Caching.detach(out, free)
  }

  /** Clustering-quality evaluation — the semantic family's analogue of
    * nd_knn_recall: per cluster, how tight are members around their own
    * centroid (`avg_own`) versus the best OTHER centroid (`avg_other`)?
    * `separation > 0` means the quantizer actually partitions the space;
    * a cluster whose members sit closer to a foreign centroid is a
    * mis-trained list. Both scores come from ONE broadcast of the
    * (metadata-sized) centroid set — per row the nearest-other score is
    * a greatest() over nLists−1 literal-joined similarities collapsed
    * map-side, so the corpus contributes one shuffle row per vector. */
  def clusterQuality(s: SparkSession, d: String,
      nLists: Int = DefaultLists,
      lloydIters: Int = Similarity.DefaultLloydIters): DataFrame = {
    import s.implicits._
    val (lists, centroids, free) = clusteredVecs(s, d, nLists, lloydIters)
    val scored = lists.join(broadcast(centroids.withColumnRenamed("list_id", "cid")))
      .select($"vec_id", $"list_id", $"cid",
              Expressions.cosineSim($"v", $"cv").as("sim"))
    val perVec = scored.groupBy($"vec_id", $"list_id")
      .agg(max(when($"cid" === $"list_id", $"sim")).as("own"),
           max(when($"cid" =!= $"list_id", $"sim")).as("other"))
    val out = perVec.groupBy($"list_id")
      .agg(count(lit(1)).as("n"),
           round(avg($"own"), 6).as("avg_own"),
           round(avg($"other"), 6).as("avg_other"),
           round(avg($"own" - $"other"), 6).as("separation"))
      .orderBy($"list_id")
    Caching.detach(out, free)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nd_dedup_semantic" -> ((s: SparkSession, d: String) => semanticDedup(s, d)),
    "nd_cluster_quality" -> ((s: SparkSession, d: String) => clusterQuality(s, d)),
    "nd_sample_prototypes" -> ((s: SparkSession, d: String) => prototypes(s, d)))

  val oracle: Map[String, String] = Map(
    "nd_dedup_semantic" -> semanticOracleSql(),
    "nd_cluster_quality" -> clusterQualityOracleSql(),
    "nd_sample_prototypes" -> prototypesOracleSql())

  private[operators] def clusterQualityOracleSql(nLists: Int = DefaultLists,
      iterations: Int = Similarity.DefaultLloydIters): String =
    s"""WITH ${Similarity.lloydChainSql(nLists, iterations)},
          scored AS (
            SELECT l.vec_id, l.list_id, c.list_id AS cid,
                   list_cosine_similarity(l.v, c.cv) AS sim
            FROM lists l CROSS JOIN cvecs$iterations c),
          pv AS (
            SELECT vec_id, list_id,
                   max(CASE WHEN cid = list_id THEN sim END) AS own,
                   max(CASE WHEN cid <> list_id THEN sim END) AS other
            FROM scored GROUP BY vec_id, list_id)
          SELECT list_id, count(*) AS n,
                 round(avg(own), 6) AS avg_own,
                 round(avg(other), 6) AS avg_other,
                 round(avg(own - other), 6) AS separation
          FROM pv GROUP BY list_id ORDER BY list_id"""

  /** DuckDB replay: the [[Similarity.lloydChainSql]] quantizer chain, then
    * the within-cluster lower-id dup rule. */
  private[operators] def semanticOracleSql(nLists: Int = DefaultLists,
      iterations: Int = Similarity.DefaultLloydIters,
      tau: Double = DefaultTau): String =
    s"""WITH ${Similarity.lloydChainSql(nLists, iterations)},
          dup AS (
            SELECT DISTINCT b.vec_id
            FROM lists a JOIN lists b USING (list_id)
            WHERE a.vec_id < b.vec_id
              AND round(list_cosine_similarity(a.v, b.v), 4) >= $tau)
          SELECT l.vec_id, l.list_id, (d.vec_id IS NULL) AS keep
          FROM lists l LEFT JOIN dup d ON l.vec_id = d.vec_id
          ORDER BY l.vec_id"""

  private[operators] def prototypesOracleSql(nLists: Int = DefaultLists,
      iterations: Int = Similarity.DefaultLloydIters, m: Int = 3): String =
    s"""WITH ${Similarity.lloydChainSql(nLists, iterations)},
          scored AS (
            SELECT list_id, vec_id, list_cosine_similarity(v, cv) AS sim
            FROM lists JOIN cvecs$iterations USING (list_id)),
          r AS (
            SELECT list_id, vec_id, sim,
                   row_number() OVER (PARTITION BY list_id
                     ORDER BY sim DESC, vec_id) AS rk
            FROM scored)
          SELECT list_id, vec_id, CAST(rk AS BIGINT) AS proto_rank,
                 round(sim, 6) AS cos_sim
          FROM r WHERE rk <= $m ORDER BY list_id, proto_rank"""
}
