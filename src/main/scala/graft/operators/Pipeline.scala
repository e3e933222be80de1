package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** End-to-end training-data curation pipeline over `documents`: quality
  * filter → exact dedup → near-dup removal → partitioned parquet write.
  * This is the write path of the engine (the reference is read-only; a
  * data pipeline is not).
  *
  * Scale notes: every stage before the write is map-side or digest-shuffle
  * only (quality scoring is codegen'd expressions; exact dedup shuffles
  * 16-byte digests; near-dup removal joins only LSH-candidate pairs); the
  * write partitions by `lang` so downstream per-language consumers prune
  * at the directory level, and `maxRecordsPerFile` bounds file sizes.
  */
object Pipeline {

  /** The surviving, curated corpus (before writing). Keeps the lowest
    * doc_id of every near-duplicate cluster. */
  def curated(s: SparkSession, d: String,
      minQuality: Double = 0.4, nearDupThreshold: Double = 0.8): DataFrame = {
    import s.implicits._
    val quality = TextAnalysis.qualityScore(s, d)
      .filter($"quality" >= minQuality).select($"doc_id")
    // exact dedup keepers
    val keepers = Dedup.exact(s, d).select($"keeper_id".as("doc_id"))
    // near-dup losers: the higher doc_id of every strong minhash pair
    val losers = Dedup.minhashPairs(s, d, nearDupThreshold)
      .select($"doc_b".as("doc_id")).distinct()
    documents(s, d)
      .join(quality, "doc_id")
      .join(keepers, "doc_id")
      .join(losers, Seq("doc_id"), "left_anti")
  }

  /** Run the pipeline and write the curated corpus partitioned by lang;
    * returns per-language output stats. */
  def curateAndWrite(s: SparkSession, d: String, outDir: String): DataFrame = {
    import s.implicits._
    curated(s, d)
      .write.mode("overwrite")
      .partitionBy("lang")
      .option("maxRecordsPerFile", 1000000)
      .parquet(outDir)
    s.read.parquet(outDir)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum(length($"text")).as("total_chars"))
      .orderBy($"lang")
  }

  /** Query-registry entry: stats of the curated corpus (write-free variant
    * so Verify/Bench don't leave output dirs around). */
  def curationStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    curated(s, d)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum(length($"text")).as("total_chars"))
      .orderBy($"lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nd_pipeline_curation" -> curationStats _)
}
