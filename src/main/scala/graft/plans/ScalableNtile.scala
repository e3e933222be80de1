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
  *  1. **deterministic range bucketing**: P−1 boundary keys are picked from
  *     a weighted sample, collected ONCE (driver metadata, like broadcast
  *     join keys), and frozen into the plan as literals; each row's range
  *     id `__pid` is a codegen'd comparison count against those literals.
  *     Because `__pid` is a pure function of the row, every consumer and
  *     every re-execution agrees on it — there is nothing to persist and
  *     no sampling to misalign (the round-2 formulation range-partitioned
  *     physically and had to cache the shuffle to keep two passes
  *     consistent; at 9M rows building that cache cost more than the
  *     single-partition sort it replaced);
  *  2. **per-range rank** via `row_number` partitioned by `__pid` (window
  *     state is per-partition, no global funnel), plus a P-row aggregate of
  *     range counts whose running sum gives each range's global rank
  *     offset (P rows of metadata, not N rows of data);
  *  3. **closed-form bucket** from the global rank: with N rows and n
  *     buckets, the first N mod n buckets get ceil(N/n) rows and the rest
  *     floor(N/n) — SQL-standard ntile semantics, so results are
  *     bit-identical to the single-partition plan.
  *
  * The order key must be an ASCENDING total order (add a unique tie-break
  * column) for the assignment to be deterministic. Boundary skew only
  * affects balance, never correctness: any range-consistent bucketing
  * yields the same global ranks.
  */
object ScalableNtile {

  /** P−1 ascending boundary keys as literal structs, frozen at plan time. */
  private def boundaryLiterals(df: DataFrame, order: Seq[Column],
      parts: Int): Seq[Column] = {
    val named = order.zipWithIndex.map { case (c, i) => c.as(s"_b$i") }
    val key = struct(named: _*)
    val n = df.count()
    if (n == 0 || parts <= 1) return Seq.empty
    // ~128 samples per target range bound the driver collect and give
    // boundaries within a few percent of even; tiny inputs sample fully
    val f = math.min(1.0, (parts * 128.0) / n)
    val sampled = df.select(key.as("__k"))
      .sample(withReplacement = false, f, seed = 42)
      .sort("__k") // sample-sized sort, driver-scale
      .collect().map(_.getStruct(0))
    if (sampled.isEmpty) return Seq.empty
    // dedupe by VALUE (tiny samples repeat entries) before building the
    // literal structs — duplicate boundaries would only add dead compares
    (1 until parts).iterator
      .map(j => (j.toLong * sampled.length / parts).toInt)
      .filter(_ > 0)
      .map(sampled(_).toSeq)
      .distinct
      .map(vs => struct(vs.zipWithIndex
        .map { case (v, i) => lit(v).as(s"_b$i") }: _*))
      .toIndexedSeq
  }

  /** Input rows + deterministic range id `__pid`: count of boundaries ≤
    * key, found by BINARY SEARCH as a balanced CASE tree over a
    * once-projected key struct — log2(P) lexicographic compares per row
    * instead of P, and the struct is built once per row instead of per
    * comparison. */
  private def withRangeId(df: DataFrame, order: Seq[Column],
      partitions: Int): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (partitions > 0) partitions else spark.sessionState.conf.numShufflePartitions
    val named = order.zipWithIndex.map { case (c, i) => c.as(s"_b$i") }
    val bounds = boundaryLiterals(df, order, parts).toIndexedSeq
    val keyed = df.withColumn("__ntk", struct(named: _*))
    def search(loPid: Int, hiPid: Int): Column =
      if (loPid == hiPid) lit(loPid)
      else {
        val mid = (loPid + hiPid + 1) / 2
        when(col("__ntk") >= bounds(mid - 1), search(mid, hiPid))
          .otherwise(search(loPid, mid - 1))
      }
    keyed.withColumn("__pid", search(0, bounds.length)).drop("__ntk")
  }

  /** Input rows + `__grank` (1-based global rank by `order`) + `__total`. */
  private def withGlobalRank(df: DataFrame, order: Seq[Column],
      partitions: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val withPid = withRangeId(df, order, partitions)
    // P rows of metadata: count per range → exclusive running sum = global
    // offset of the range's first row; windows over P rows are
    // driver-scale, not data-scale.
    val wMeta = Window.orderBy($"__pid")
    val offsets = withPid.groupBy($"__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        coalesce(sum($"__cnt").over(wMeta.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__total",
        sum($"__cnt").over(wMeta.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select($"__pid", $"__offset", $"__total")
    val wRank = Window.partitionBy($"__pid").orderBy(order: _*)
    withPid
      .withColumn("__rn", row_number().over(wRank).cast("long"))
      .join(broadcast(offsets), "__pid")
      .withColumn("__grank", $"__offset" + $"__rn")
      .drop("__pid", "__rn", "__offset")
  }

  /** The input with 1-based exact global rank + total count columns —
    * `row_number() OVER (ORDER BY order)` + `count(*) OVER ()` without the
    * single-partition funnel, by the same per-range rank + P-row offset
    * broadcast decomposition as [[ntile]]. `order` must be a total order
    * for the rank to be deterministic; consumers that only read the VALUE
    * at a given rank (order-statistic queries) may tie-break arbitrarily. */
  def globalRank(df: DataFrame, order: Seq[Column], rankCol: String,
      totalCol: String, partitions: Int = 0): DataFrame =
    withGlobalRank(df, order, partitions)
      .withColumnRenamed("__grank", rankCol)
      .withColumnRenamed("__total", totalCol)

  /** PER-GROUP exact 1-based rank — `row_number() OVER (PARTITION BY
    * group ORDER BY order)` without one-partition-per-group: a window
    * partitioned by a bounded- or skewed-cardinality key sorts every row
    * of a hub group in ONE task (a token with 1e9 holders, an event type
    * with 1e10 rows), which no ROWS-frame bound fixes. Decomposition is
    * [[globalRank]]'s, applied to the composite (group ++ order) key:
    *
    *  1. boundaries are sampled over the COMPOSITE key, so the range id
    *     `__pid` is group-major — within a group, `pid` is monotone in
    *     `order`, and one group spans as many ranges as its share of the
    *     data (a hub group gets many ranges = many tasks);
    *  2. per-(group, __pid) counts — at most groups + P rows (each group
    *     adds its range-span count, spans overlap only at boundaries) —
    *     turn into per-group exclusive prefix sums via a window over the
    *     AGGREGATE (state-scale, the PlanAudit-sanctioned shape);
    *  3. rank = per-(group, range) `row_number` + broadcast offset.
    *
    * Bit-identical to the window form when (order) is a total order
    * within each group — including NULL group keys, which form their own
    * partition exactly as `PARTITION BY` treats them (the offset
    * join-back is null-safe `<=>`). `group` are column NAMES of `df`
    * (they key the offset join-back); `order` are expressions. */
  def groupedRank(df: DataFrame, group: Seq[String], order: Seq[Column],
      rankCol: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val gCols = group.map(col)
    val withPid = withRangeId(df, gCols ++ order, partitions)
    val wMeta = Window.partitionBy(gCols: _*).orderBy($"__pid")
    val offsets = withPid.groupBy(gCols :+ $"__pid": _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        coalesce(sum($"__cnt").over(wMeta.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(gCols :+ $"__pid" :+ $"__offset": _*)
    val wRank = Window.partitionBy(gCols :+ $"__pid": _*).orderBy(order: _*)
    // NULL-safe (<=>) join-back: the `row_number() OVER (PARTITION BY
    // group)` form this claims bit-identity with keeps NULL as its own
    // partition, and an inner equi-join would silently drop those rows —
    // so the offset frame is renamed and matched with EqualNullSafe.
    val off2 = offsets.select(
      group.map(g => col(g).as(s"__og_$g")) :+ $"__pid".as("__opid") :+ $"__offset": _*)
    val cond = group.map(g => col(g) <=> col(s"__og_$g"))
      .foldLeft($"__pid" === $"__opid")(_ && _)
    withPid
      .withColumn("__rn", row_number().over(wRank).cast("long"))
      .join(broadcast(off2), cond)
      .withColumn(rankCol, $"__offset" + $"__rn")
      .drop(group.map(g => s"__og_$g"): _*)
      .drop("__opid", "__pid", "__rn", "__offset")
  }

  /** The input with an extra long column = the INCLUSIVE global running
    * total of `value` in `order` — `sum(value) OVER (ORDER BY order ROWS
    * UNBOUNDED PRECEDING)` without the single-partition funnel that window
    * plans: per-range prefix sums (window state per range) plus a P-row
    * exclusive-offset broadcast, the same decomposition as [[ntile]]'s
    * global rank. `order` must be a total order and `value` must not be
    * NULL; boundary skew affects balance only, never the result. */
  def runningTotal(df: DataFrame, value: Column, order: Seq[Column],
      totalCol: String, partitions: Int = 0): DataFrame =
    runningTotals(df, Seq(value -> totalCol), order, partitions)

  /** [[runningTotal]] for SEVERAL value columns in one pass: the range
    * bucketing (count + boundary sample + one shuffle) and the per-range
    * prefix window are shared, so N cumulative sums over the same order
    * cost one decomposition instead of N — the per-range window computes
    * all N prefix sums in the same WindowExec, and the P-row offset frame
    * carries one offset column per value. */
  def runningTotals(df: DataFrame, values: Seq[(Column, String)],
      order: Seq[Column], partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val tagged = values.zipWithIndex.map { case ((v, out), i) => (s"__v$i", v, out) }
    val withPid = tagged.foldLeft(withRangeId(df, order, partitions)) {
      case (acc, (n, v, _)) => acc.withColumn(n, v)
    }
    val wMeta = Window.orderBy($"__pid")
    val sums = tagged.map { case (n, _, _) => sum(col(n)).as(s"${n}sum") }
    val offsets = tagged.foldLeft(
        withPid.groupBy($"__pid").agg(sums.head, sums.tail: _*)) {
        case (acc, (n, _, _)) => acc.withColumn(s"${n}off",
          coalesce(sum(col(s"${n}sum")).over(
            wMeta.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      }
      .select(($"__pid" +: tagged.map(t => col(s"${t._1}off"))): _*)
    val wCum = Window.partitionBy($"__pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = tagged.foldLeft(withPid) { case (acc, (n, _, _)) =>
      acc.withColumn(s"${n}cum", sum(col(n)).over(wCum))
    }.join(broadcast(offsets), "__pid")
    tagged.foldLeft(cum) { case (acc, (n, _, outCol)) =>
        acc.withColumn(outCol, col(s"${n}off") + col(s"${n}cum"))
      }
      .drop("__pid" +: tagged.flatMap(t => Seq(t._1, s"${t._1}cum", s"${t._1}off")): _*)
  }

  /** The input with an extra long `bucketCol` = `ntile(n) OVER (ORDER BY
    * order)`, computed without a single-partition sort. */
  def ntile(df: DataFrame, n: Int, order: Seq[Column], bucketCol: String = "bucket",
      partitions: Int = 0): DataFrame = {
    // N = q*n + r: first r buckets take q+1 rows, the rest q (CASE keeps
    // the q-division unevaluated when q = 0, i.e. N < n).
    val bucket = expr(
      s"""CAST(CASE
            WHEN __grank <= (__total % $n) * ((__total div $n) + 1)
            THEN (__grank - 1) div ((__total div $n) + 1)
            ELSE (__total % $n) + (__grank - (__total % $n) * ((__total div $n) + 1) - 1) div (__total div $n)
          END + 1 AS BIGINT)""")
    withGlobalRank(df, order, partitions)
      .withColumn(bucketCol, bucket)
      .drop("__grank", "__total")
  }

  /** [[ntile]] with the INPUT frame persisted for the algorithm's four
    * passes (row count, boundary sample, range counts, ranking) plus a
    * cleanup to release it once the downstream result materializes.
    *
    * Unlike the round-2 formulation this cache is a pure OPTIMIZATION —
    * correctness never depends on it (the range id is a deterministic
    * expression), so an eviction merely recomputes. It pays off exactly
    * when the input is expensive to produce (a chain scan, a computed
    * quality frame); callers passing a cheap pruned parquet projection can
    * use [[ntile]] directly and skip the cache. */
  def ntileDetachable(df: DataFrame, n: Int, order: Seq[Column],
      bucketCol: String = "bucket", partitions: Int = 0): (DataFrame, () => Unit) = {
    // eager localCheckpoint (the Caching.iterCheckpoint mode contract),
    // not a lazy persist: the r14 probe measured the columnar
    // InMemoryRelation path costing more than recomputing the input,
    // while the LogicalRDD cut also frees the four passes from
    // re-analyzing the input's full logical plan
    val cached = Caching.iterCheckpoint(df)
    (ntile(cached, n, order, bucketCol, partitions),
      () => Caching.freeCheckpoint(cached))
  }
}
