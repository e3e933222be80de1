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
}
