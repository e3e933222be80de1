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

  private def batchScans(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
  }

  test("LIMIT pushes into the block scan: plans <=limit blocks, not a full partition") {
    import org.apache.spark.sql.functions.col
    val dir = graft.sources.eth.EthFixtures.ensure(spark)
    val df = spark.read.format("ethereum")
      .option("table", "block").option("chain", dir).load().limit(10)
    assert(df.count() == 10)
    val scan = batchScans(df).head
    assert(scan.scan.description().contains("pushedLimit=10"), scan.scan.description())
    assert(scan.inputPartitions.size == 1,
      s"LIMIT 10 planned ${scan.inputPartitions.size} partitions")
    // fan-out tables keep the limit as a per-task early-exit (partial push)
    val tx = spark.read.format("ethereum")
      .option("table", "transaction").option("chain", dir).load().limit(7)
    assert(tx.count() == 7)
    assert(batchScans(tx).head.scan.description().contains("pushedLimit=7"))
  }

  test("TopN on block_number pushes: DESC takes the tip-most blocks only") {
    import org.apache.spark.sql.functions.col
    val dir = graft.sources.eth.EthFixtures.ensure(spark)
    val df = spark.read.format("ethereum")
      .option("table", "block").option("chain", dir).load()
      .select("block_number").orderBy(col("block_number").desc).limit(5)
    val top = df.collect().map(_.getLong(0)).toSeq
    assert(top == Seq(6000L, 5999L, 5998L, 5997L, 5996L), top.toString)
    val scan = batchScans(df).head
    assert(scan.scan.description().contains("topN=block_number DESC"),
      scan.scan.description())
    assert(scan.inputPartitions.size == 1,
      s"TopN 5 planned ${scan.inputPartitions.size} partitions")
  }

  test("count/min/max on a block range are answered from metadata, zero blocks fetched") {
    import org.apache.spark.sql.functions.{col, count, lit, max, min}
    val dir = graft.sources.eth.EthFixtures.ensure(spark)
    val df = spark.read.format("ethereum")
      .option("table", "block").option("chain", dir).load()
      .filter(col("block_number").between(100, 299))
      .agg(count(lit(1)), min(col("block_number")), max(col("block_number")))
    val row = df.collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((200L, 100L, 299L)))
    val scan = batchScans(df).head
    assert(scan.scan.description().contains(
      "pushedAggregate=count(*),min(block_number),max(block_number)"),
      scan.scan.description())
    assert(scan.inputPartitions.forall(
      _.isInstanceOf[graft.sources.eth.EthereumAggPartition]),
      "pushed aggregate still planned block-fetch partitions")
  }

  test("min/max(block_timestamp) pushes: monotone-chain endpoint fetches, no scan") {
    import org.apache.spark.sql.functions.{col, count, lit, max, min}
    val dir = graft.sources.eth.EthFixtures.ensure(spark)
    val client = graft.sources.eth.EthClient.forChain(dir)
    val df = spark.read.format("ethereum")
      .option("table", "block").option("chain", dir).load()
      .filter(col("block_number").between(100, 299))
      .agg(count(lit(1)), min(col("block_timestamp")), max(col("block_timestamp")))
    val row = df.collect().head
    // monotone chain: min/max(ts) over [100, 299] are the endpoint stamps
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ==
      ((200L, client.timestampOf(100L), client.timestampOf(299L))))
    val scan = batchScans(df).head
    assert(scan.scan.description().contains(
      "pushedAggregate=count(*),min(block_timestamp),max(block_timestamp)"),
      scan.scan.description())
    assert(scan.inputPartitions.forall(
      _.isInstanceOf[graft.sources.eth.EthereumAggPartition]),
      "pushed timestamp aggregate still planned block-fetch partitions")
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
    // the decode-heaviest table: ERC-20 transfers batch into vectors too
    val ercDf = spark.read.format("ethereum")
      .option("table", "erc20").option("chain", dir).load()
      .filter(col("erc20_blockNumber") <= 50)
    val ercPlan = ercDf.queryExecution.executedPlan.toString
    assert(ercPlan.contains("ColumnarToRow"), s"erc20 scan not columnar:\n$ercPlan")
    ercDf.collect() // decode path actually executes through the vector fill
  }
}
