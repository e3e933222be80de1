package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for 100 TB operation: bucketed table layout
  * (co-located joins with no exchange) and pre-partitioned writes.
  *
  * At scale, fact↔fact joins (lineitem⋈orders on orderkey) are the
  * expensive shuffles; bucketing both sides by the join key at ingest
  * amortizes that shuffle into the write once, and every subsequent join
  * or aggregation on the key runs exchange-free.
  */
object Layout {

  /** Write `df` as a bucketed managed table (sorted within buckets on the
    * same key). Existing table is replaced. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // the in-memory catalog forgets tables across JVMs but the warehouse
    // dir persists — clear the stale location too
    val loc = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    val dir = new java.io.File(new java.io.File(loc.getPath), table)
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
    df
      // cluster rows by the bucket key BEFORE the bucketed write: without
      // this every input task writes its own file per bucket it sees (up
      // to tasks × buckets small files per table — guide §6), and the
      // downstream exchange-free join pays per-file open cost on every
      // one. Repartitioning on the key bounds the layout at one file per
      // bucket per owning task; bucket membership is unchanged (the
      // writer re-hashes the key), so the join result is identical.
      .repartition(buckets, col(key))
      .write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Bucket both sides of a join key once, then return the exchange-free
    * join. */
  def colocatedJoin(spark: SparkSession, left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, buckets: Int = 8,
      namePrefix: String = "graft_bkt"): DataFrame = {
    writeBucketed(left, s"${namePrefix}_l", leftKey, buckets)
    writeBucketed(right, s"${namePrefix}_r", rightKey, buckets)
    val l = spark.table(s"${namePrefix}_l")
    val r = spark.table(s"${namePrefix}_r")
    l.join(r, l(leftKey) === r(rightKey))
  }

  // ---- Z-order (Morton) clustering ----
  //
  // Bucketing co-locates ONE key; multi-dimensional range workloads (box
  // filters on two id columns) need file-level locality in BOTH — sorting
  // by either column alone leaves the other scattered across every file.
  // Interleaving the bits of the two keys (the Morton / Z-curve) gives a
  // single sort key whose contiguous ranges are bounded 2-D boxes, so a
  // range-partitioned write clusters both dimensions at once and parquet
  // min/max footer stats prune files for filters on EITHER column.

  /** Spread the low 16 bits of `c` to the even bit positions (0,2,...,30)
    * — the classic 4-step mask/shift Morton spreading, pure integer ops
    * that replay exactly in any engine. */
  private def mortonSpread(c: Column): Column = {
    val a = c.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x33333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Z-value of two 16-bit keys: x on even bits, y on odd bits.
    *
    * Inputs MUST be normalized to comparable bit widths first (see
    * [[zorderedWrite]]): interleaving raw keys whose ranges differ makes
    * the wide key's high bits dominate the top of the Z code, and a
    * range-partitioned write degenerates to a single-column sort — the
    * narrow dimension scatters across every file again. */
  def zValue(x: Column, y: Column): Column =
    mortonSpread(x).bitwiseOR(shiftleft(mortonSpread(y), 1))

  /** Write `df` range-partitioned on the Z-value of `(xCol, yCol)` —
    * the OPTIMIZE-ZORDER layout pass. Both columns are min/max-normalized
    * to the full 16-bit range before interleaving (the bounds are a
    * 1-row metadata aggregate), so equal Z prefixes mean bounded boxes in
    * BOTH dimensions regardless of the raw key ranges. After this write,
    * a box filter on both columns, or a range filter on either one,
    * touches only the files whose footer min/max intersect it
    * (spec-measured: a y-only range over an x-sorted layout hits every
    * file; over the Z layout it hits a bounded subset). */
  def zorderedWrite(df: DataFrame, xCol: String, yCol: String,
      outDir: String, nFiles: Int): Unit = {
    val b = df.agg(min(col(xCol)).cast("long"), max(col(xCol)).cast("long"),
                   min(col(yCol)).cast("long"), max(col(yCol)).cast("long"))
      .collect()(0)
    val (xlo, xhi, ylo, yhi) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    // widen BEFORE the multiply: an IntegerType key with range > ~32k
    // would overflow (key - lo) * 65535 in 32-bit arithmetic, silently
    // corrupting z-values (layout-only damage, but real)
    val xn = expr(s"CAST(((CAST($xCol AS BIGINT) - $xlo) * 65535) DIV ${math.max(xhi - xlo, 1)} AS BIGINT)")
    val yn = expr(s"CAST(((CAST($yCol AS BIGINT) - $ylo) * 65535) DIV ${math.max(yhi - ylo, 1)} AS BIGINT)")
    df.withColumn("__z", zValue(xn, yn))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }
}
