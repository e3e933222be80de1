package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Physical-plan quality gates — the 100 TB design checks: broadcasts where
  * a dim is small, pushed filters + pruned schemas at the parquet scan,
  * partial aggregation before shuffles, top-k without global sort. These
  * assert the *shape* stays right as queries evolve.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p: SparkPlan => p.toString
    }
  }

  test("q02 broadcasts the dimension tables (no shuffle for nation/region)") {
    val plan = executed(Relational.q02RevenueByNation(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("q01 pushes the shipdate filter and prunes columns at the parquet scan") {
    val df = Relational.q01PricingSummary(spark, sf)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$scan")
    assert(!scan.contains("l_orderkey"), "scan reads unprojected columns")
  }

  test("scalable ntile ranks via deterministic range ids, not a single-partition data sort") {
    import spark.implicits._
    val df = graft.plans.ScalableNtile.ntile(
      graft.Tables.orders(spark, sf), 4, Seq($"o_totalprice", $"o_orderkey"))
    val plan = executed(df)
    assert(plan.contains("hashpartitioning(__pid"), s"no per-range partitioning:\n$plan")
    // the data-scale window must be partitioned by the range-partition id;
    // the only SinglePartition exchange allowed is the P-row metadata agg
    val dataWindow = plan.linesIterator.find(l => l.contains("row_number()"))
    assert(dataWindow.exists(_.contains("__pid")), s"row_number not per-partition:\n$plan")
    // and it matches the literal single-partition window form exactly
    val w = org.apache.spark.sql.expressions.Window.orderBy($"o_totalprice", $"o_orderkey")
    val expected = graft.Tables.orders(spark, sf)
      .select($"o_orderkey", org.apache.spark.sql.functions.ntile(4).over(w).cast("long").as("bucket"))
    val got = df.select($"o_orderkey", $"bucket")
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("scalable ntile edge cases match the literal window form") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{lit => flit, ntile => fntile}
    val w = org.apache.spark.sql.expressions.Window.orderBy($"x")
    def viaWindow(df: org.apache.spark.sql.DataFrame, n: Int) =
      df.select($"x", fntile(n).over(w).cast("long").as("bucket"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def viaScale(df: org.apache.spark.sql.DataFrame, n: Int) =
      graft.plans.ScalableNtile.ntile(df, n, Seq($"x"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // empty input
    assert(graft.plans.ScalableNtile.ntile(
      Seq.empty[Long].toDF("x"), 4, Seq($"x")).collect().isEmpty)
    // fewer rows than buckets (the q = 0 branch of the closed form)
    val tiny = Seq(3L, 1L, 2L).toDF("x")
    assert(viaScale(tiny, 4) == viaWindow(tiny, 4))
    // single row
    val one = Seq(42L).toDF("x")
    assert(viaScale(one, 7) == viaWindow(one, 7))
    // forced single range (partitions=1 -> no boundaries at all)
    val mid = (1L to 100L).toDF("x")
    val single = graft.plans.ScalableNtile.ntile(mid, 4, Seq($"x"), partitions = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(single == viaWindow(mid, 4))
    // many duplicate-free rows, buckets not dividing N evenly
    val uneven = (1L to 103L).toDF("x")
    assert(viaScale(uneven, 7) == viaWindow(uneven, 7))
  }

  test("scalable running total matches the literal window and never funnels data") {
    import spark.implicits._
    val orders = graft.Tables.orders(spark, sf)
      .select($"o_orderkey", ($"o_custkey" % 100 + 1).as("v"))
    val got = graft.plans.ScalableNtile.runningTotal(
      orders, $"v", Seq($"o_orderkey"), "rt")
    // the data-scale cumulative window is partitioned by range id; only
    // the P-row metadata aggregate may pass a single partition
    val plan = executed(got)
    assert(plan.contains("hashpartitioning(__pid"), s"no per-range partitioning:\n$plan")
    // exact equality with sum() OVER (ORDER BY ...) — the plan this
    // decomposition exists to avoid
    val w = org.apache.spark.sql.expressions.Window.orderBy($"o_orderkey")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val expected = orders.select($"o_orderkey",
      org.apache.spark.sql.functions.sum($"v").over(w).as("rt"))
    val a = got.select($"o_orderkey", $"rt")
    assert(a.except(expected).isEmpty && expected.except(a).isEmpty)
    // edge cases: empty input, single row, forced single range
    assert(graft.plans.ScalableNtile.runningTotal(
      Seq.empty[Long].toDF("x"), $"x", Seq($"x"), "rt").collect().isEmpty)
    val one = graft.plans.ScalableNtile.runningTotal(
      Seq(7L).toDF("x"), $"x", Seq($"x"), "rt").collect()
    assert(one.length == 1 && one(0).getAs[Long]("rt") == 7L)
    val mid = (1L to 100L).toDF("x")
    val single = graft.plans.ScalableNtile.runningTotal(
      mid, $"x", Seq($"x"), "rt", partitions = 1)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("rt")).toMap
    assert((1L to 100L).forall(i => single(i) == i * (i + 1) / 2))
  }

  test("grouped rank matches the per-group window form and never funnels a hub group") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{row_number, when}
    // skewed groups: g=0 holds ~90% of rows — the hub-key shape that makes
    // a PARTITION BY g window sort one group in one task
    val orders = graft.Tables.orders(spark, sf)
      .select($"o_orderkey", when($"o_custkey" % 10 < 9, 0L).otherwise($"o_custkey" % 10).as("g"),
        $"o_totalprice")
    val got = graft.plans.ScalableNtile.groupedRank(
      orders, Seq("g"), Seq($"o_totalprice", $"o_orderkey"), "r")
    // the data-scale row_number window must be keyed by (g, __pid), so a
    // hub group spans as many tasks as its share of the ranges
    val plan = executed(got)
    val dataWindow = plan.linesIterator.find(_.contains("row_number()"))
    assert(dataWindow.exists(l => l.contains("__pid") && l.contains("g#")),
      s"row_number not per-(group, range):\n$plan")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"o_totalprice", $"o_orderkey")
    val expected = orders.select($"o_orderkey",
      row_number().over(w).cast("long").as("r"))
    val a = got.select($"o_orderkey", $"r")
    assert(a.except(expected).isEmpty && expected.except(a).isEmpty)
    // edge cases: empty input; single row; forced single range
    assert(graft.plans.ScalableNtile.groupedRank(
      Seq.empty[(Long, Long)].toDF("g", "x"), Seq("g"), Seq($"x"), "r")
      .collect().isEmpty)
    val one = graft.plans.ScalableNtile.groupedRank(
      Seq((1L, 7L)).toDF("g", "x"), Seq("g"), Seq($"x"), "r").collect()
    assert(one.length == 1 && one(0).getAs[Long]("r") == 1L)
    val tiny = Seq((0L, 3L), (0L, 1L), (1L, 5L), (1L, 2L), (1L, 9L)).toDF("g", "x")
    val single = graft.plans.ScalableNtile.groupedRank(
        tiny, Seq("g"), Seq($"x"), "r", partitions = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("r")).toMap
    assert(single == Map((0L, 1L) -> 1L, (0L, 3L) -> 2L,
      (1L, 2L) -> 1L, (1L, 5L) -> 2L, (1L, 9L) -> 3L))
  }

  test("q03 top-k plans TakeOrderedAndProject, not a global sort") {
    val plan = Relational.q03TopCustomers(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k missing:\n$plan")
  }

  test("q50 correlated LATERAL decorrelates to a group-limit rank, not a nested loop") {
    val p = executed(Relational.q50LateralTopk(spark, sf))
    assert(p.contains("WindowGroupLimit"),
      s"lateral top-k did not decorrelate to a group-limit window:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"lateral executed as a per-row nested loop:\n$p")
  }

  test("aggregates run partial (map-side) before the shuffle") {
    val plan = Relational.q01PricingSummary(spark, sf).queryExecution.executedPlan.toString
    val firstAgg = plan.indexOf("HashAggregate")
    assert(firstAgg >= 0 && plan.indexOf("HashAggregate", firstAgg + 1) > 0,
      s"expected two-phase hash aggregate:\n$plan")
  }

  test("ethereum erc20 range scan plans only the selected block ranges") {
    import org.apache.spark.sql.functions.col
    val dir = graft.sources.eth.EthFixtures.ensure(spark)
    val df = spark.read.format("ethereum")
      .option("table", "erc20").option("chain", dir).load()
      .filter(col("erc20_blockNumber").between(2000, 2999))
    assert(df.rdd.getNumPartitions == 2, // 1000 blocks / 512
      s"range not narrowed: ${df.rdd.getNumPartitions} partitions")
  }

  test("catalog mount exposes SHOW TABLES and DESCRIBE like the reference") {
    Catalog.mount(spark, sf)
    val tables = spark.sql("SHOW TABLES").collect().map(_.getString(1)).toSet
    assert((Catalog.corpusTables ++ Catalog.ethTables).forall(tables.contains),
      s"missing tables in $tables")
    // golden schema check vs /root/reference/README.md:139-186
    val desc = spark.sql("DESCRIBE block").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.size == 18)
    assert(desc("block_number") == "bigint" && desc("block_size") == "int" &&
      desc("block_gasUsed") == "double")
    val descTx = spark.sql("DESCRIBE transaction").collect().map(_.getString(0))
    assert(descTx.length == 11)
    val descErc = spark.sql("DESCRIBE erc20").collect().map(_.getString(0))
    assert(descErc.length == 6)
    // DSv2 catalog surface: golden DESCRIBE with the reference's bounded
    // varchar widths (EthereumMetadata.java:48-51, README.md:139-186)
    val ethTables = spark.sql("SHOW TABLES IN ethereum").collect().map(_.getString(1)).toSet
    assert(ethTables == Set("block", "transaction", "erc20"))
    val cdesc = spark.sql("DESCRIBE ethereum.default.block").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cdesc("block_hash") == "varchar(66)", s"block_hash: ${cdesc("block_hash")}")
    assert(cdesc("block_nonce") == "varchar(18)")
    assert(cdesc("block_logsBloom") == "varchar(514)")
    assert(cdesc("block_miner") == "varchar(42)")
    assert(cdesc("block_extraData") == "string") // unbounded varchar
    assert(cdesc("block_transactions") == "array<varchar(66)>")
    val ctx = spark.sql("DESCRIBE ethereum.default.transaction").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ctx("tx_hash") == "varchar(66)" && ctx("tx_from") == "varchar(42)" &&
      ctx("tx_input") == "string")
    val cerc = spark.sql("DESCRIBE ethereum.default.erc20").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cerc("erc20_to") == "varchar(42)" && cerc("erc20_txHash") == "varchar(66)")
    // qualified reads through the catalog produce the same rows
    val viaCat = spark.sql(
      "SELECT block_number, block_miner FROM ethereum.default.block WHERE block_number <= 5")
    assert(viaCat.collect().length == 5)
    // inline SQL over mounted views + UDFs (README.md:189-196 shape)
    val r = spark.sql(
      "SELECT fromWei(tx_value, 'ether') AS v FROM transaction WHERE tx_blockNumber <= 3").collect()
    assert(r.nonEmpty)
  }

  test("GraftExtensions injects functions via withExtensions") {
    import org.apache.spark.sql.SparkSession
    val prev = TestSpark.spark // ensure context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]").appName("ext-test")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        "SELECT hamming64(simhash60(array('x','y')), simhash60(array('x','y'))) h").head()
      assert(r.getInt(0) == 0)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
