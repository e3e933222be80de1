package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, EthQueries, Eval, Events, Multimodal, Pii, Pipeline, Relational, Semantic, Similarity, StreamQueries, Subqueries, TextAnalysis, TpchShapes}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator name → (session, sfDir) → DataFrame; `oracleSql`
  * carries the DuckDB-equivalent SQL for the driver's differential check.
  * Column names/aliases match pairwise (the compare sorts columns by name).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q02RevenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Subqueries.queries ++ TpchShapes.queries ++
      Events.queries ++ EthQueries.queries ++ Eval.queries ++
      TextAnalysis.queries ++ Dedup.queries ++ Similarity.queries ++
      Semantic.queries ++ Pii.queries ++ Multimodal.queries ++
      Pipeline.queries ++ StreamQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Subqueries.oracle ++ TpchShapes.oracle ++
      Events.oracle ++ EthQueries.oracle ++ Eval.oracle ++
      TextAnalysis.oracle ++ Dedup.oracle ++ Similarity.oracle ++
      Semantic.oracle ++ Pii.oracle ++ Multimodal.oracle ++
      Pipeline.oracle ++ StreamQueries.oracle
}
