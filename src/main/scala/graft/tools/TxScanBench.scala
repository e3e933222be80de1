package graft.tools

import org.apache.spark.sql.SparkSession

/** Before/after evidence for the TRANSACTION-table columnar reader
  * (round-9 review item 5): times the same full-decode scan aggregate
  * over the scale chain with the columnar batch reader ON (the default
  * production path) and OFF (the `columnar=false` debug read option →
  * row-at-a-time `InternalRow` reader), N runs each, minima reported.
  * The aggregate touches every column class the tx reader decodes
  * (strings, longs, doubles) and is NOT pushdown-eligible, so the wall
  * is scan+decode+codegen-consume — exactly the path the columnar
  * reader exists for. The erc20 fan-out table rides along as a second
  * case.
  *
  * Run: `SPARK_GRAFT_SCALE_CHAIN=/tmp/graft-eth-scale-1m
  * SPARK_GRAFT_CHAIN_BLOCKS=1000000 runMain graft.tools.TxScanBench`
  * (chain generation is cached by marker file — reuse the dir the other
  * scale tools populated).
  */
object TxScanBench {
  private def timeMin(runs: Int)(f: => Unit): Double =
    (1 to runs).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_TXBENCH_RUNS", "3").toInt.max(1)
    val blocks = sys.env.getOrElse("SPARK_GRAFT_CHAIN_BLOCKS", "1000000").toLong
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
    graft.sources.eth.EthFixtures.ensureChainOnly(dir, blocks)

    def tbl(name: String, columnar: Boolean) = spark.read.format("ethereum")
      .option("table", name).option("chain", dir)
      .option("columnar", columnar.toString).load()

    // full-width decode aggregate; sum/length are not pushdown tokens, so
    // every row is decoded and consumed by whole-stage codegen
    def txAgg(columnar: Boolean): Long =
      tbl("transaction", columnar)
        .selectExpr("sum(tx_nonce)", "sum(length(tx_input))",
          "sum(tx_gas)", "count(tx_hash)")
        .collect()(0).getLong(3)
    def ercAgg(columnar: Boolean): Long =
      tbl("erc20", columnar)
        .selectExpr("sum(erc20_value)", "sum(length(erc20_from))",
          "count(erc20_txHash)")
        .collect()(0).getLong(2)

    // pruned numeric aggregate — the common analytical shape (3 of 11
    // columns, all fixed-width): here the vectors pay off, where the
    // full-width case is dominated by string materialization both ways
    def txPruned(columnar: Boolean): Long =
      tbl("transaction", columnar)
        .selectExpr("sum(tx_gas)", "sum(tx_gasPrice)", "count(tx_nonce)")
        .collect()(0).getLong(2)

    txAgg(columnar = true) // warmup: page cache + codegen
    println(s"| scan (${blocks / 1000}k blocks) | rows | columnar wall (min of $runs) | row-reader wall | speedup |")
    println("|---|---|---|---|---|")
    for ((name, f) <- Seq(
        "transaction full-decode agg" -> ((c: Boolean) => txAgg(c)),
        "transaction pruned numeric agg" -> ((c: Boolean) => txPruned(c)),
        "erc20 full-decode agg" -> ((c: Boolean) => ercAgg(c)))) {
      var rows = 0L
      val tCol = timeMin(runs) { rows = f(true) }
      val tRow = timeMin(runs) { rows = f(false) }
      println(f"| $name | $rows | $tCol%.2fs | $tRow%.2fs | ${tRow / tCol}%.2fx |")
    }
    spark.stop()
  }
}
