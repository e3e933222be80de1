package graft

import org.apache.spark.sql.SparkSession

import graft.functions.{Expressions, Web3Functions}
import graft.sources.eth.EthFixtures

/** Session bootstrap: registers every table as a temp view and every
  * function into the session registry, so the full surface is reachable
  * from plain `spark.sql` — the analogue of mounting the reference's
  * connector catalog (`SHOW TABLES` / `DESCRIBE` / inline UDFs,
  * `/root/reference/README.md:129-196`).
  */
object Catalog {
  val corpusTables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")
  val ethTables: Seq[String] = Seq("block", "transaction", "erc20")

  /** Register just the driver corpus tables as temp views. */
  def mountCorpus(spark: SparkSession, sfDir: String): Unit =
    corpusTables.foreach { t =>
      // events needs the nanos-timestamp normalization in its loader
      val df = if (t == "events") Tables.events(spark, sfDir)
               else Tables.t(spark, sfDir, t)
      df.createOrReplaceTempView(t)
    }

  /** Register the driver corpus (testdata dir) + the three ethereum tables
    * + all scalar functions against one session. */
  def mount(spark: SparkSession, sfDir: String,
      chainDir: String = EthFixtures.DefaultDir): Unit = {
    mountCorpus(spark, sfDir)
    ethTables.foreach { t =>
      spark.read.format("ethereum")
        .option("table", t).option("chain", chainDir).load()
        .createOrReplaceTempView(t)
    }
    Web3Functions.register(spark, chainDir)
    Expressions.register(spark)
    // the DSv2 catalog surface: SHOW TABLES IN ethereum / DESCRIBE
    // ethereum.default.block (bounded-varchar widths) / qualified SELECTs
    spark.conf.set("spark.sql.catalog.ethereum", classOf[graft.sources.eth.EthereumCatalog].getName)
    spark.conf.set("spark.sql.catalog.ethereum.chain", chainDir)
  }
}
