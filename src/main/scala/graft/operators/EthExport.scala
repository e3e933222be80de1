package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.eth.EthSchemas

/** Chain → parquet materialization — the "export once, analyze many"
  * pattern. The reference re-fetches every scanned block from the node on
  * every query ("it takes forever", `README.md:15`); the standard remedy is
  * a one-time ranged export to columnar files, after which all analytics
  * run at parquet speed with no node in the loop.
  *
  * Output is partitioned by `block_chunk` (= blockNumber div `chunkSize`),
  * so downstream block-range predicates prune at directory level exactly
  * like the source's pushdown — and incremental exports append only the
  * new chunks.
  */
object EthExport {

  /** Export one table's block range; returns the re-read frame. */
  def exportTable(s: SparkSession, chain: String, table: String, outDir: String,
      startBlock: Long, endBlock: Long, chunkSize: Long = 100000L): DataFrame = {
    val numberCol = EthSchemas.blockNumberColumn(EthSchemas.kindOf(table))
    s.read.format("ethereum")
      .option("table", table).option("chain", chain).load()
      .filter(col(numberCol).between(startBlock, endBlock))
      .withColumn("block_chunk", expr(s"$numberCol div $chunkSize"))
      .write.mode("overwrite")
      .partitionBy("block_chunk")
      .parquet(s"$outDir/$table")
    s.read.parquet(s"$outDir/$table")
  }

  /** Export the full reference table set over a range. */
  def exportAll(s: SparkSession, chain: String, outDir: String,
      startBlock: Long, endBlock: Long, chunkSize: Long = 100000L): Unit =
    EthSchemas.allTables.foreach(t =>
      exportTable(s, chain, t, outDir, startBlock, endBlock, chunkSize))
}
