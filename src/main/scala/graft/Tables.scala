package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet corpus (TESTDATA.md).
  *
  * Tables are plain parquet, one file per table, at `dir/<name>.parquet`.
  * At 100 TB each of these would be a partitioned directory; all call sites
  * go through here so swapping in a partitioned/bucketed layout (or a real
  * catalog) is a one-line change.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark has no
    * native type for. Read it as a nanos long (legacy conf) and truncate to a
    * micros TimestampType — the same nanos→micros floor DuckDB applies, so
    * both engines see identical instants.
    */
  /** Events with `ts` normalized to session-local TimestampType whatever
    * physical encoding the generator chose: int64 nanos (read as LONG via
    * the legacy flag, floored to micros) or parquet timestamp[us] without
    * UTC adjustment (read as TIMESTAMP_NTZ, reinterpreted at the UTC
    * session zone — a pure wall-clock relabel, so `unix_millis` agrees
    * with DuckDB's `epoch_ms` on the same file either way). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the TIMESTAMP_NTZ→timestamp relabel below is epoch-preserving ONLY at
    // a UTC session zone; every entrypoint sets UTC already, but the
    // invariant is enforced here, where it is relied upon (a non-UTC caller
    // would silently shift every epoch)
    s.conf.set("spark.sql.session.timeZone", "UTC")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
