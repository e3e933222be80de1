package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Web3Functions
import graft.sources.eth._

object TestSpark {
  /** The SHARED suite session runs local[32] with the default single task
    * attempt, so any unexpected task failure fails its suite LOUDLY — a
    * retry-capable shared master would silently paper over flaky or
    * nondeterministic tasks in every suite (round-8 review). Only
    * [[withRetryingScheduler]] (used by FaultInjectionSpec) swaps in a
    * `local[32,4]` context, and restores single-attempt afterwards.
    * Suites run sequentially in the one forked test JVM (sbt
    * `testForkedParallel` default), so the swap never races a peer. */
  @volatile private var current: SparkSession = _

  private def build(master: String): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def spark: SparkSession = synchronized {
    if (current == null || current.sparkContext.isStopped)
      current = build("local[32]")
    current
  }

  /** Run `f` against a task-retry-capable context (`local[32,4]`), then
    * tear it down so the next [[spark]] access rebuilds the strict
    * single-attempt shared context. */
  def withRetryingScheduler[T](f: SparkSession => T): T = synchronized {
    if (current != null && !current.sparkContext.isStopped) current.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = build("local[32,4]")
    current = s
    try f(s)
    finally {
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      current = null
    }
  }
}

/** Unit semantics of the ERC-20 decode (reference branches at
  * `EthereumRecordCursor.java:151-189`). */
class Erc20DecoderSpec extends AnyFunSuite {
  import Erc20Decoder._
  private val bat = "0x0d8775f648430679a709e98d2b0cb6250d2887ef" // BAT
  private def w(hex40: String) = "0x" + "0" * 24 + hex40.drop(2)
  private val from = "0x" + "a" * 40
  private val to = "0x" + "b" * 40
  private val vWord = "0x" + "0" * 56 + "000f4240" // 1,000,000

  test("indexed 3-topic transfer decodes") {
    val log = EthLog(bat, Vector(TransferTopic, w(from), w(to)), vWord, "0xt", 7L)
    val r = decode(log).get
    assert(r == Erc20Transfer("BAT", from, to, 1000000.0, "0xt", 7L,
      java.math.BigInteger.valueOf(1000000L)))
  }
  test("transfer topic matches case-insensitively") {
    val log = EthLog(bat, Vector(TransferTopic.toUpperCase.replace("0X", "0x"), w(from), w(to)), vWord, "0xt", 7L)
    assert(decode(log).isDefined)
  }
  test("unindexed 1-topic transfer fills fields from data") {
    val data = "0x" + w(from).drop(2) + w(to).drop(2) + vWord.drop(2)
    val r = decode(EthLog(bat, Vector(TransferTopic), data, "0xt", 7L)).get
    assert(r.from == from && r.to == to && r.value == 1000000.0)
  }
  test("partially-indexed 2-topic transfer fills rest from data") {
    val data = "0x" + w(to).drop(2) + vWord.drop(2)
    val r = decode(EthLog(bat, Vector(TransferTopic, w(from)), data, "0xt", 7L)).get
    assert(r.from == from && r.to == to && r.value == 1000000.0)
  }
  test("malformed unindexed arity is dropped") {
    val data = "0x" + w(from).drop(2) + w(to).drop(2) // only 2 words: 1+2 != 4
    assert(decode(EthLog(bat, Vector(TransferTopic), data, "0xt", 7L)).isEmpty)
  }
  test("ERC-721-style empty data coerces value to 0.0") {
    val r = decode(EthLog(bat, Vector(TransferTopic, w(from), w(to), vWord), "0x", "0xt", 7L)).get
    assert(r.value == 0.0)
  }
  test("non-Transfer topic is dropped") {
    assert(decode(EthLog(bat, Vector("0x" + "1" * 64, w(from), w(to)), vWord, "0xt", 7L)).isEmpty)
  }
  test("unknown contract formats as ERC20(addr), preserving case") {
    val addr = "0xAbC" + "0" * 37
    assert(tokenName(addr) == s"ERC20($addr)")
  }
  test("known contract resolves regardless of case") {
    assert(tokenName(bat.toUpperCase.replace("0X", "0x")) == "BAT")
  }
  test("h32ToH20 keeps low 20 bytes") {
    assert(h32ToH20(w(from)) == from)
  }
  test("hexToDouble narrows BigInteger like the reference") {
    assert(hexToDouble("0x" + "f" * 64) == BigInt("f" * 64, 16).toDouble)
    assert(hexToDouble("0x") == 0.0)
  }
}

/** Unit table parity with `udfs/EthereumUnit.java:3-27`. */
class Web3UnitsSpec extends AnyFunSuite {
  test("all 16 unit names, aliases included") {
    val expect = Map("WEI" -> 1.0, "KWEI" -> 1e3, "ADA" -> 1e3, "MWEI" -> 1e6,
      "BABBAGE" -> 1e6, "GWEI" -> 1e9, "SHANNON" -> 1e9, "SZABO" -> 1e12,
      "FINNEY" -> 1e15, "ETHER" -> 1e18, "KETHER" -> 1e21, "GRAND" -> 1e21,
      "EINSTEIN" -> 1e21, "METHER" -> 1e24, "GETHER" -> 1e27, "TETHER" -> 1e30)
    assert(Web3Functions.unitsToWei == expect)
  }
  test("fromWei/toWei roundtrip and case-insensitivity") {
    for (u <- Web3Functions.unitsToWei.keys) {
      val x = 123456.789
      val rt = Web3Functions.toWei(Web3Functions.fromWei(x, u.toLowerCase), u)
      assert(math.abs(rt - x) <= 1e-9 * x, s"unit $u roundtrip: $rt != $x")
    }
    assert(Web3Functions.fromWei(1e18, "ether") == 1.0)
    assert(Web3Functions.toWei(2.0, "gwei") == 2e9)
  }
  test("blockFromTag resolves named tags, hex quantities, decimal heights") {
    assert(Web3Functions.blockFromTag("latest").isEmpty)
    assert(Web3Functions.blockFromTag("PENDING").isEmpty)
    assert(Web3Functions.blockFromTag("earliest").contains(1L))
    assert(Web3Functions.blockFromTag("0x10").contains(16L))
    assert(Web3Functions.blockFromTag("42").contains(42L))
    intercept[IllegalArgumentException](Web3Functions.blockFromTag("nonsense"))
  }
}

/** Randomized differential check of the pushdown: any combination of
  * block-number / timestamp / hash predicates must produce exactly the rows
  * a plain filter over the independently generated expected table produces
  * — i.e. range narrowing never drops or duplicates rows. */
class PushdownFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val dir = EthFixtures.ensure(spark)
  private def eth = spark.read.format("ethereum")
    .option("table", "block").option("chain", dir).load()
  private lazy val expected = spark.read.parquet(s"$dir/expected/block")

  test("random block-number/timestamp range predicates match the expected table") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(20260812L)
    val tsBase = expected.agg(org.apache.spark.sql.functions.min(col("block_timestamp")))
      .head().getLong(0)
    for (i <- 1 to 8) {
      val a = 1L + rnd.nextInt(6000)
      val b = 1L + rnd.nextInt(6000)
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val pred = i % 4 match {
        case 0 => col("block_number").between(lo, hi)
        case 1 => col("block_number") >= lo && col("block_number") < hi
        case 2 => (col("block_number") === lo) || col("block_number").between(hi, hi + 10)
        case _ => col("block_timestamp").between(tsBase + lo * 13, tsBase + hi * 13)
      }
      val got = eth.filter(pred).select("block_number").collect().map(_.getLong(0)).sorted
      val want = expected.filter(pred).select("block_number").collect().map(_.getLong(0)).sorted
      assert(got.sameElements(want),
        s"case $i pred=$pred: got ${got.length} rows, want ${want.length}")
    }
  }
}

/** Export path: chain → chunk-partitioned parquet, content-identical. */
class EthExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  test("exported table equals the live scan and prunes by chunk directory") {
    import org.apache.spark.sql.functions.col
    val dir = EthFixtures.ensure(spark)
    val out = java.nio.file.Files.createTempDirectory("ethexport").toString
    val reread = graft.operators.EthExport.exportTable(
      spark, dir, "block", out, startBlock = 1, endBlock = 2000, chunkSize = 500)
    val direct = spark.read.format("ethereum")
      .option("table", "block").option("chain", dir).load()
      .filter(col("block_number").between(1, 2000))
    assert(reread.count() == 2000 && direct.count() == 2000)
    assert(reread.drop("block_chunk").except(direct).isEmpty)
    // chunk layout: blocks 1..2000 at 500/chunk -> chunks 0..4 (2000 div 500 = 4)
    val chunkDirs = new java.io.File(s"$out/block").listFiles()
      .filter(_.getName.startsWith("block_chunk=")).map(_.getName).sorted
    assert(chunkDirs.length == 5, chunkDirs.mkString(","))
    val pruned = reread.filter(col("block_chunk") === 2)
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters: [isnotnull(block_chunk"),
      "chunk filter not pruned")
    assert(pruned.count() == 500)
  }
}

/** Catalog contract: reference's fixed namespace/tables, read-only DDL. */
class EthereumCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  test("catalog is read-only and rejects unknown tables") {
    import org.apache.spark.sql.connector.catalog.Identifier
    val dir = EthFixtures.ensure(spark)
    val cat = new EthereumCatalog
    cat.initialize("ethereum",
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("chain", dir)))
    assert(cat.listNamespaces().map(_.toSeq).toSeq == Seq(Seq("default")))
    assert(cat.listTables(Array("default")).map(_.name).toSet ==
      Set("block", "transaction", "erc20"))
    assert(!cat.tableExists(Identifier.of(Array("default"), "nope")))
    intercept[org.apache.spark.sql.catalyst.analysis.NoSuchTableException](
      cat.loadTable(Identifier.of(Array("default"), "nope")))
    intercept[UnsupportedOperationException](
      cat.dropTable(Identifier.of(Array("default"), "block")))
    intercept[UnsupportedOperationException](
      cat.createNamespace(Array("x"), java.util.Map.of()))
  }
  test("weiDecimal catalog option surfaces DECIMAL(38,0) wei columns") {
    import org.apache.spark.sql.connector.catalog.Identifier
    import org.apache.spark.sql.types.DecimalType
    val dir = EthFixtures.ensure(spark)
    val cat = new EthereumCatalog
    cat.initialize("ethdec",
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("chain", dir, "weiDecimal", "true")))
    val t = cat.loadTable(Identifier.of(Array("default"), "transaction"))
    val byName = t.schema().fields.map(f => f.name -> f.dataType).toMap
    assert(byName("tx_value") == DecimalType(38, 0))
    assert(byName("tx_gasPrice") == DecimalType(38, 0))
  }
}

/** The standalone SQL decode generator must reproduce the fused erc20
  * scan exactly — two code paths, one decode function, zero drift. */
class Erc20GeneratorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  test("erc20_transfers over the raw log table equals the erc20 scan") {
    val dir = EthFixtures.ensure(spark)
    graft.functions.Expressions.register(spark)
    spark.read.format("ethereum").option("table", "log").option("chain", dir).load()
      .createOrReplaceTempView("gen_logs")
    val viaGen = spark.sql(
      """SELECT t.* FROM gen_logs
         LATERAL VIEW erc20_transfers(log_address, log_topics, log_data,
                                      log_txHash, log_blockNumber) t""")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val viaScan = spark.read.format("ethereum")
      .option("table", "erc20").option("chain", dir).load()
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(viaGen.length == viaScan.length && viaGen.nonEmpty)
    assert(viaGen.zip(viaScan).forall { case (a, b) => a == b })
  }

  test("wrong-typed arguments fail at analysis with the signature, not at runtime") {
    graft.functions.Expressions.register(spark)
    import spark.implicits._
    Seq(("0xa", Seq("0xt"), "0x", "0xh", 7))
      .toDF("addr", "topics", "data", "txh", "bn_int")
      .createOrReplaceTempView("gen_badargs")
    // INT block number (arg 5 must be BIGINT)
    val e1 = intercept[org.apache.spark.sql.AnalysisException](spark.sql(
      """SELECT t.* FROM gen_badargs
         LATERAL VIEW erc20_transfers(addr, topics, data, txh, bn_int) t""").collect())
    assert(e1.getMessage.contains("block_number") && e1.getMessage.contains("BIGINT"),
      e1.getMessage)
    // non-array topics (arg 2 must be ARRAY<STRING>)
    val e2 = intercept[org.apache.spark.sql.AnalysisException](spark.sql(
      """SELECT t.* FROM gen_badargs
         LATERAL VIEW erc20_transfers(addr, data, data, txh, CAST(bn_int AS BIGINT)) t""").collect())
    assert(e2.getMessage.contains("topics"), e2.getMessage)
    // a cast fixes it
    assert(spark.sql(
      """SELECT t.* FROM gen_badargs
         LATERAL VIEW erc20_transfers(addr, topics, data, txh, CAST(bn_int AS BIGINT)) t""")
      .collect().isEmpty) // non-Transfer topic decodes to zero rows, no crash
  }
}

/** DSv2 custom-metric reporting of the scan + readers. */
class EthMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  test("scan declares metrics and readers report fetch/emit counts") {
    import graft.sources.eth._
    val dir = EthFixtures.ensure(spark)
    val scan = new EthereumScan(EthSchemas.Transaction, dir,
      EthSchemas.transactionSchema, Some(Seq((1L, 10L))), 512)
    assert(scan.supportedCustomMetrics().map(_.name).toSet ==
      Set("blocksFetched", "rowsEmitted"))
    val reader = new EthereumPartitionReader(EthSchemas.Transaction, dir,
      EthSchemas.transactionSchema, 1L, 10L)
    var rows = 0
    while (reader.next()) rows += 1
    val m = reader.currentMetricsValues().map(v => v.name -> v.value).toMap
    assert(m("blocksFetched") == 10L, s"blocksFetched=${m("blocksFetched")}")
    assert(m("rowsEmitted") == rows.toLong && rows > 0)
    val colReader = new EthereumColumnarReader(EthSchemas.Block, dir, EthSchemas.blockSchema, 1L, 7L)
    var batches = 0
    while (colReader.next()) batches += 1
    val cm = colReader.currentMetricsValues().map(v => v.name -> v.value).toMap
    assert(cm("blocksFetched") == 7L && batches >= 1)
    colReader.close()
  }
}

/** Range algebra used by the pushdown. */
class BlockRangesSpec extends AnyFunSuite {
  test("normalize merges overlapping and adjacent") {
    assert(BlockRanges.normalize(Seq((5L, 10L), (1L, 3L), (4L, 6L))) == Seq((1L, 10L)))
    assert(BlockRanges.normalize(Seq((1L, 2L), (9L, 9L))) == Seq((1L, 2L), (9L, 9L)))
    assert(BlockRanges.normalize(Seq((5L, 3L))) == Seq.empty)
  }
  test("intersect composes conjuncts") {
    assert(BlockRanges.intersect(Seq((1L, 100L)), Seq((50L, 200L))) == Seq((50L, 100L)))
    assert(BlockRanges.intersect(Seq((1L, 10L), (20L, 30L)), Seq((5L, 25L))) ==
      Seq((5L, 10L), (20L, 25L)))
    assert(BlockRanges.intersect(Seq((1L, 10L)), Seq((20L, 30L))) == Seq.empty)
  }
}

/** DSv2 source end-to-end vs the independently generated expected tables. */
class EthereumSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val dir = EthFixtures.ensure(spark)
  private def eth(table: String) =
    spark.read.format("ethereum").option("table", table).option("chain", dir).load()
  private def expected(table: String) = spark.read.parquet(s"$dir/expected/$table")

  test("block scan matches expected table exactly") {
    assert(eth("block").except(expected("block")).isEmpty)
    assert(expected("block").except(eth("block")).isEmpty)
    assert(eth("block").count() == EthFixtures.Blocks)
  }
  test("transaction scan matches expected table exactly") {
    assert(eth("transaction").except(expected("transaction")).isEmpty)
    assert(expected("transaction").except(eth("transaction")).isEmpty)
  }
  test("erc20 decode scan matches expected table exactly") {
    // collect-and-compare (not except) because legitimate duplicate transfer
    // rows exist; sort order fixed by all columns
    val got = eth("erc20").collect().map(_.toSeq).sortBy(_.mkString("|"))
    val exp = expected("erc20").collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(got.length == exp.length)
    assert(got.sameElements(exp))
  }
  test("block-number range pushdown narrows partitions and rows") {
    import org.apache.spark.sql.functions.col
    val df = eth("block").filter(col("block_number").between(1000, 1999))
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 2) // 1000 blocks / 512 per partition
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ranges=[1000,1999]"), s"plan missed range: $plan")
  }
  test("hash point lookup plans a single-block scan") {
    import org.apache.spark.sql.functions.col
    val df = eth("block").filter(col("block_hash") === EthFixtures.blockHash(42))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ranges=[42,42]"), s"plan missed hash rewrite: $plan")
    val rows = df.collect()
    assert(rows.length == 1 && rows(0).getAs[Long]("block_number") == 42L)
  }
  test("unknown hash scans nothing") {
    import org.apache.spark.sql.functions.col
    val df = eth("block").filter(col("block_hash") === ("0x" + "0" * 64))
    assert(df.rdd.getNumPartitions == 0 && df.count() == 0)
  }
  test("timestamp range pushdown narrows the scan but keeps exact rows") {
    import org.apache.spark.sql.functions.col
    val lo = 1438269988L + 13 * 1000; val hi = 1438269988L + 13 * 1100
    val df = eth("block").filter(col("block_timestamp").between(lo, hi))
    val n = df.count()
    assert(n > 0 && n < 300) // ~100 blocks +- jitter
    val parts = df.rdd.getNumPartitions
    assert(parts <= 2, s"timestamp pushdown did not narrow: $parts partitions")
    // exactness: every row within bounds (residual filter applied)
    assert(df.collect().forall { r =>
      val t = r.getAs[Long]("block_timestamp"); t >= lo && t <= hi })
  }
  test("column pruning reaches the reader") {
    import org.apache.spark.sql.functions.col
    val df = eth("block").select(col("block_miner"))
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("block_miner") && !scan.contains("block_logsBloom"),
      s"pruning missing: $scan")
  }
  test("IN and OR predicates become multi-range scans") {
    import org.apache.spark.sql.functions.col
    val df = eth("block").filter(col("block_number").isin(5, 1000, 4999))
    assert(df.count() == 3)
    assert(df.rdd.getNumPartitions == 3)
  }
  test("weiDecimal mode surfaces exact DECIMAL(38,0) wei values") {
    import org.apache.spark.sql.functions.col
    val df = spark.read.format("ethereum")
      .option("table", "erc20").option("chain", dir)
      .option("weiDecimal", "true").load()
      .filter(col("erc20_blockNumber") <= 200)
    val t = df.schema("erc20_value").dataType
    assert(t == org.apache.spark.sql.types.DecimalType(38, 0), s"got $t")
    val vals = df.select("erc20_value").collect().map(_.getDecimal(0))
    assert(vals.nonEmpty && vals.forall(_.scale == 0))
    // decoder keeps the full uint256 where double loses precision
    val huge = "0x" + "f" * 64
    assert(Erc20Decoder.hexToBigInt(huge) == BigInt(("f" * 64), 16).bigInteger)
    assert(Erc20Decoder.hexToBigInt("0x") == java.math.BigInteger.ZERO)
  }

  test("runtime filtering prunes chain ranges under a broadcast join (DPP-style)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // the filtering side must be a real scan with a surviving selective
    // Filter node (a LocalRelation constant-folds it away)
    val tmp = java.nio.file.Files.createTempDirectory("dpp").toString
    Seq(5L, 700L, 5555L, -1L).toDF("bn").write.mode("overwrite").parquet(tmp)
    val wanted = spark.read.parquet(tmp).filter($"bn" > 0)
    val blocks = eth("block").select("block_number", "block_miner")
    val joined = blocks.join(
      org.apache.spark.sql.functions.broadcast(wanted), $"block_number" === $"bn")
    val rows = joined.collect()
    assert(rows.length == 3)
    val planned = joined.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    // the scan itself should have been narrowed to the three joined blocks
    // (visible as single-block ranges), not the full chain
    assert(planned.contains("ranges=[5,5],[700,700],[5555,5555]") ||
           !planned.contains("full-chain"),
      s"runtime filter did not narrow the scan:\n$planned")
  }

  test("source reports statistics for join planning") {
    import org.apache.spark.sql.functions.col
    val df = eth("block").filter(col("block_number") <= 100)
    val scan = df.queryExecution.optimizedPlan.collectLeaves().head
    val stats = scan.stats
    assert(stats.rowCount.isEmpty || stats.rowCount.get > 0 || stats.sizeInBytes > 0)
  }
}
