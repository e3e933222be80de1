package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lifecycle control for within-query persisted intermediates.
  *
  * Several operators persist a corpus-scale intermediate because their DAG
  * forks over it (the LSH sketch base, the exploded trigram frame, the
  * range-partitioned ntile input). A bare `.persist()` pins those blocks in
  * the session's cache manager until `clearCache`, so a long-lived session
  * that runs such queries repeatedly accumulates storage-memory pressure —
  * the round-2 review's "cache leak" finding.
  *
  * [[detach]] is the discipline applied everywhere now: materialize the
  * query's RESULT while the cached inputs are still live, then free the
  * inputs immediately. After the call, pinned storage is at most
  * O(result) — and when the result is small enough to hold on the driver
  * (the common case: these queries end in aggregates or thresholded pair
  * lists) it becomes a local relation and NOTHING stays pinned.
  */
object Caching {

  /** The conf value last installed via `setCheckpointDir` — guards against
    * both per-iteration directory leaks (same value installs once) and
    * stale installs (a changed `spark.graft.checkpointDir` re-installs). */
  private var installedCheckpointDir: Option[String] = None

  /** Materialize `result`, then run `free` (unpersist the corpus-scale
    * inputs its computation needed). Results with at most `maxLocalRows`
    * rows come back as a driver-local frame and every cached block is
    * released; larger results stay persisted (result-sized residual only).
    *
    * The row threshold bounds driver memory: callers pass results that are
    * either aggregates (rows = group count) or thresholded candidate lists,
    * so the local path is the overwhelmingly common one. Order of `result`
    * is preserved on both paths (collect keeps it; a LocalRelation scans
    * in row order).
    */
  /** Eagerly truncate the lineage of per-iteration loop state (PageRank,
    * label propagation). Re-assigned DataFrames otherwise re-analyze and
    * re-execute the whole prefix each round — quadratic work and an
    * exponentially wider plan (measured 75s → 5s on eth_q19).
    *
    * Default mode is `localCheckpoint(eager = true)`: blocks live on
    * executors NON-REPLICATED, which is correct on `local[*]` but means a
    * single executor loss mid-loop kills the query on a real cluster (no
    * lineage left to recover). For cluster deployments set
    * `spark.graft.checkpointDir` to a reliable location (HDFS/object
    * store): state is then written through `checkpoint()` and survives
    * executor loss. The checkpoint dir is installed on the SparkContext
    * once PER CONFIGURED VALUE (`setCheckpointDir` mints a fresh random
    * subdirectory per call, so re-setting it every iteration would leak
    * directories; a CHANGED conf value re-installs, so reconfiguring the
    * dir mid-session takes effect). Results are identical in both modes;
    * only durability
    * and write cost differ (state is |V|-row bounded, so the reliable
    * write is metadata-scale, not data-scale).
    */
  def iterCheckpoint(df0: DataFrame): DataFrame = {
    val spark = df0.sparkSession
    // test-only fault-injection seam: the checkpoint is exactly where loop
    // state crosses rounds, so this is where a task failure must be
    // injected to prove the recovery contract (FaultInjection is inert —
    // df0 passes through untouched — unless the conf is set by a spec)
    val df = FaultInjection.maybeWrap(df0)
    spark.conf.getOption("spark.graft.checkpointDir").filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        synchronized {
          if (!installedCheckpointDir.contains(dir)) {
            sc.setCheckpointDir(dir)
            installedCheckpointDir = Some(dir)
          }
        }
        df.checkpoint() // eager + reliable
      case None => df.localCheckpoint(true)
    }
  }

  def detach(result: DataFrame, free: () => Unit,
      maxLocalRows: Long = 100000L): DataFrame = {
    val spark = result.sparkSession
    val cached = result.persist(StorageLevel.MEMORY_AND_DISK)
    val n = cached.count()
    val out =
      if (n <= maxLocalRows) {
        val rows = java.util.Arrays.asList(cached.collect(): _*)
        val local = spark.createDataFrame(rows, result.schema)
        cached.unpersist(blocking = false)
        local
      } else cached
    free()
    out
  }

  /** Release the storage behind a frame produced by [[iterCheckpoint]]
    * once it is SUPERSEDED or fully consumed. `localCheckpoint` persists
    * the truncated RDD (MEMORY_AND_DISK) and registers it with the
    * context until the ContextCleaner happens to GC it — an iterative
    * loop that re-checkpoints every round would otherwise pin O(rounds)
    * copies of its state. Digs the persisted RDD out of the frame's
    * `LogicalRDD` leaves and unpersists it directly (a plain
    * `Dataset.unpersist` only consults the cache manager, which never
    * knew about checkpoint storage). Reliable-checkpoint frames hold
    * their data in files, not blocks — unpersist is a harmless no-op
    * there. CAUTION: the freed frame must never be evaluated again
    * (its lineage was truncated at the freed blocks). */
  def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** The per-session driver-localization bound. Overridable so specs can
    * force the distributed fallback with a planted small threshold and so
    * cluster deployments with bigger drivers can raise it. */
  def maxLocalRows(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption("spark.graft.maxLocalRows").map(_.toLong)
      .getOrElse(100000L)

  /** Detach a DRAINED memory-sink table so it can be self-joined.
    *
    * Two branches of one streaming memory-sink table trip Spark's
    * conflicting-reference analysis check, so the drained frame must be
    * re-rooted before a read-off that forks over it. Small tables (at
    * most [[maxLocalRows]]) become a driver-local relation — cheapest and
    * leaves nothing pinned. Larger ones are NOT collected: the lineage is
    * cut with [[iterCheckpoint]] (reliable `checkpoint()` when
    * `spark.graft.checkpointDir` is set, `localCheckpoint` otherwise),
    * which yields a fresh distributed plan root that self-joins fine.
    * The residual is the checkpointed table itself — state-scale, the
    * same residual discipline as [[detach]]'s large branch. This is the
    * guard the round-7 review demanded for `nd_stream_percentiles`: a
    * high-cardinality drained histogram never materializes on the
    * driver. */
  def detachSink(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val limit = maxLocalRows(spark)
    // cheap bounded probe: take(limit+1) stops scanning once the bound is
    // exceeded instead of counting the full table
    val probe = df.take(if (limit >= Int.MaxValue - 1) Int.MaxValue - 1
                        else limit.toInt + 1)
    if (probe.length <= limit) {
      spark.createDataFrame(java.util.Arrays.asList(probe: _*), df.schema)
    } else {
      iterCheckpoint(df)
    }
  }
}
