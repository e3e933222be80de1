package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.EthQueries

/** Wall-time measurement of the round-7 chain-analytics family at a
  * ~100k-block chain (17× the oracle fixture — the PushdownPayoff growth
  * pattern): proves the query SHAPES (histogram read-offs, addr-keyed
  * joins, per-block windows, consecutive-block equi-joins, first-seen
  * aggregates) hold their cost profile when the chain grows, instead of
  * only asserting it from the plans. Prints a markdown table for
  * COVERAGE.md; best-of-N (`SPARK_GRAFT_PAYOFF_RUNS`, default 2). One-off
  * measurement main — correctness for these shapes is the oracle gate,
  * scale-shape assertions live in EthAnalyticsSpec/PlanAuditSpec. */
object ChainAnalyticsScale {
  /** Chain size: default ~100k blocks; the round-8 evidence run sets
    * SPARK_GRAFT_CHAIN_BLOCKS=1000000 (170x the oracle fixture). */
  private val ChainBlocks: Long =
    sys.env.getOrElse("SPARK_GRAFT_CHAIN_BLOCKS", "100000").toLong

  private def timeMin(runs: Int)(f: => Unit): Double =
    (1 to runs).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PAYOFF_RUNS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_CHAIN",
      s"${System.getProperty("java.io.tmpdir")}/graft-eth-scale")
    graft.sources.eth.EthFixtures.ensureChainOnly(dir, ChainBlocks)

    def tbl(name: String): DataFrame = spark.read.format("ethereum")
      .option("table", name).option("chain", dir).load()

    // warmup: page cache + codegen for all three scan kinds
    tbl("block").count(); tbl("transaction").count(); tbl("erc20").count()

    val cases: Seq[(String, () => DataFrame)] = Seq(
      "eth_q25 gas market (histogram read-off)" ->
        (() => EthQueries.q25GasMarketOf(tbl("transaction"))),
      "eth_q26 cohorts (addr-keyed join)" ->
        (() => EthQueries.q26AddressCohortsOf(tbl("transaction"))),
      "eth_q30 gas order (per-block window)" ->
        (() => EthQueries.q30GasOrderAuditOf(tbl("transaction"))),
      "eth_q31 integrity (consecutive equi-join)" ->
        (() => EthQueries.q31ChainIntegrityOf(
          tbl("block").selectExpr("block_number", "block_difficulty", "block_totalDifficulty"))),
      "eth_q32 adoption (first-seen aggregate)" ->
        (() => EthQueries.q32AdoptionOf(tbl("erc20"))))

    println(s"| query shape | ${ChainBlocks / 1000}k-block wall (min of $runs) | rows |")
    println("|---|---|---|")
    cases.foreach { case (name, mk) =>
      var rows = 0L
      val t = timeMin(runs) { rows = mk().count() }
      println(f"| $name | $t%.2fs | $rows |")
    }
    spark.stop()
  }
}
