package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EthQueries

/** Plan shape of the ethereum queries: the reported source statistics must
  * be good enough for Catalyst to broadcast the block side of the fk join
  * (the reference reports no stats at all, SURVEY §4). */
class EthPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("eth_q8 fk join broadcasts one side thanks to reported statistics") {
    val df = EthQueries.q8TxPerMiner(spark, "")
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert(plan.contains("BroadcastHashJoin"), s"fk join shuffled both sides:\n$plan")
  }

  test("all eth tables scan columnar (vectors + ColumnarToRow, like a file source)") {
    import org.apache.spark.sql.functions.col
    val dir = graft.sources.eth.EthFixtures.ensure(spark)
    val df = spark.read.format("ethereum")
      .option("table", "block").option("chain", dir).load()
      .filter(col("block_number") <= 600)
      .select("block_number", "block_miner", "block_gasUsed", "block_transactions")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), s"block scan not columnar:\n$plan")
    assert(df.count() == 600)
    // the fan-out tables batch too: flattened block->N rows land in vectors
    val txPlan = spark.read.format("ethereum")
      .option("table", "transaction").option("chain", dir).load()
      .filter(col("tx_blockNumber") <= 10)
      .queryExecution.executedPlan.toString
    assert(txPlan.contains("ColumnarToRow"), s"tx scan not columnar:\n$txPlan")
  }
}
