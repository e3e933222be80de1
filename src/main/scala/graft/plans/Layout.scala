package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    df.write
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
}
