package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global `ntile` without a single-partition sort.
  *
  * `ntile(n) OVER (ORDER BY ...)` (reference `use-cases.sql:18-34`) plans a
  * `Window` over `Exchange SinglePartition` in any engine — every row
  * funnels through one task, which is the first thing to fall over at
  * 100 TB. This operator computes the *same* bucket assignment in three
  * scale-safe steps:
  *
  *  1. **range-partition** the input on the order key (sampled boundaries,
  *     the same machinery as a distributed sort) — each partition holds a
  *     contiguous key range;
  *  2. **per-partition rank** via `row_number` partitioned by the range
  *     partition id (window state is per-partition, no global funnel), plus
  *     a P-row side aggregate of partition counts whose running sum gives
  *     each partition's global rank offset (P = #partitions, so this
  *     "global" window is over P rows of metadata, not N rows of data);
  *  3. **closed-form bucket** from the global rank: with N rows and n
  *     buckets, the first N mod n buckets get ceil(N/n) rows and the rest
  *     floor(N/n) — SQL-standard ntile semantics, so results are
  *     bit-identical to the single-partition plan.
  *
  * The order key must be a total order (add a unique tie-break column) for
  * the assignment to be deterministic.
  */
object ScalableNtile {

  /** Input rows + `__grank` (1-based global rank by `order`) + `__total`,
    * plus the persisted range-partitioned frame for lifecycle control. */
  private def withGlobalRank(df: DataFrame, order: Seq[Column],
      partitions: Int): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts =
      if (partitions > 0) partitions else spark.sessionState.conf.numShufflePartitions
    // Persisted because the frame forks into the rank pass and the count
    // pass: repartitionByRange picks boundaries by SAMPLING, so two
    // re-executions of the lineage can produce different partitionings and
    // the offsets would not line up with the ranks. One materialization
    // (memory-and-disk — at cluster scale the same bytes a distributed
    // sort would spill to shuffle anyway) makes both passes consistent.
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // P rows of metadata: count per range partition → exclusive running sum
    // = global offset of the partition's first row; windows over P rows are
    // driver-scale, not data-scale.
    val wMeta = Window.orderBy($"__pid")
    val offsets = ranged.groupBy($"__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        coalesce(sum($"__cnt").over(wMeta.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__total",
        sum($"__cnt").over(wMeta.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select($"__pid", $"__offset", $"__total")
    val wRank = Window.partitionBy($"__pid").orderBy(order: _*)
    val ranked = ranged
      .withColumn("__rn", row_number().over(wRank).cast("long"))
      .join(broadcast(offsets), "__pid")
      .withColumn("__grank", $"__offset" + $"__rn")
      .drop("__pid", "__rn", "__offset")
    (ranked, ranged)
  }

  /** The input with an extra long `bucketCol` = `ntile(n) OVER (ORDER BY
    * order)`, computed without a single-partition sort.
    *
    * The internal range-partitioned frame stays persisted for the life of
    * the returned frame (it is what keeps the two passes consistent — see
    * [[withGlobalRank]]). Callers that aggregate the result and want the
    * cache released should use [[ntileDetachable]] and free it once the
    * downstream result is materialized (see [[Caching.detach]]).
    */
  def ntile(df: DataFrame, n: Int, order: Seq[Column], bucketCol: String = "bucket",
      partitions: Int = 0): DataFrame =
    ntileDetachable(df, n, order, bucketCol, partitions)._1

  /** [[ntile]] plus a cleanup that unpersists the internal
    * range-partitioned frame. Only call the cleanup after the downstream
    * query has materialized — the bucket assignment is only stable while
    * the sampled range partitioning is pinned. */
  def ntileDetachable(df: DataFrame, n: Int, order: Seq[Column],
      bucketCol: String = "bucket", partitions: Int = 0): (DataFrame, () => Unit) = {
    // N = q*n + r: first r buckets take q+1 rows, the rest q (CASE keeps
    // the q-division unevaluated when q = 0, i.e. N < n).
    val bucket = expr(
      s"""CAST(CASE
            WHEN __grank <= (__total % $n) * ((__total div $n) + 1)
            THEN (__grank - 1) div ((__total div $n) + 1)
            ELSE (__total % $n) + (__grank - (__total % $n) * ((__total div $n) + 1) - 1) div (__total div $n)
          END + 1 AS BIGINT)""")
    val (ranked, ranged) = withGlobalRank(df, order, partitions)
    val out = ranked
      .withColumn(bucketCol, bucket)
      .drop("__grank", "__total")
    (out, () => { ranged.unpersist(blocking = false); () })
  }
}
