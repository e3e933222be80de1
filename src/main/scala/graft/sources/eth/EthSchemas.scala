package graft.sources.eth

import org.apache.spark.sql.types._

/** Table kinds + fixed schemas of the ethereum source.
  *
  * Column names, order and types mirror the reference's hard-coded catalog
  * (`EthereumMetadata.java:98-147`, golden `DESCRIBE` at `README.md:138-186`).
  * Presto bounded `varchar(n)` maps to Spark `StringType` (length bounds are
  * metadata-only in Spark); Presto BIGINT/INTEGER/DOUBLE map 1:1.
  */
object EthSchemas {
  sealed abstract class TableKind(val name: String)
  case object Block extends TableKind("block")
  case object Transaction extends TableKind("transaction")
  case object Erc20 extends TableKind("erc20")

  def kindOf(name: String): TableKind = name.toLowerCase match {
    case "block"       => Block
    case "transaction" => Transaction
    case "erc20"       => Erc20
    case other => throw new IllegalArgumentException(
      s"unknown ethereum table '$other' (expected block|transaction|erc20)")
  }

  val blockSchema: StructType = StructType(Seq(
    StructField("block_number", LongType, nullable = false),
    StructField("block_hash", StringType, nullable = false),
    StructField("block_parentHash", StringType),
    StructField("block_nonce", StringType),
    StructField("block_sha3Uncles", StringType),
    StructField("block_logsBloom", StringType),
    StructField("block_transactionsRoot", StringType),
    StructField("block_stateRoot", StringType),
    StructField("block_miner", StringType),
    StructField("block_difficulty", LongType),
    StructField("block_totalDifficulty", LongType),
    StructField("block_size", IntegerType),
    StructField("block_extraData", StringType),
    StructField("block_gasLimit", DoubleType),
    StructField("block_gasUsed", DoubleType),
    StructField("block_timestamp", LongType),
    StructField("block_transactions", ArrayType(StringType)),
    StructField("block_uncles", ArrayType(StringType))))

  val transactionSchema: StructType = StructType(Seq(
    StructField("tx_hash", StringType, nullable = false),
    StructField("tx_nonce", LongType),
    StructField("tx_blockHash", StringType),
    StructField("tx_blockNumber", LongType),
    StructField("tx_transactionIndex", IntegerType),
    StructField("tx_from", StringType),
    StructField("tx_to", StringType, nullable = true),
    StructField("tx_value", DoubleType),
    StructField("tx_gas", DoubleType),
    StructField("tx_gasPrice", DoubleType),
    StructField("tx_input", StringType)))

  val erc20Schema: StructType = StructType(Seq(
    StructField("erc20_token", StringType),
    StructField("erc20_from", StringType),
    StructField("erc20_to", StringType),
    StructField("erc20_value", DoubleType),
    StructField("erc20_txHash", StringType),
    StructField("erc20_blockNumber", LongType)))

  def schemaFor(kind: TableKind): StructType = kind match {
    case Block       => blockSchema
    case Transaction => transactionSchema
    case Erc20       => erc20Schema
  }

  /** Wei-valued columns that the reference lossily narrows to double
    * (`EthereumRecordCursor.java:204-211`, `EthereumERC20Utils.java:8-14`).
    * In `weiDecimal` quality mode they surface as DECIMAL(38,0) instead —
    * exact uint256 wei (documented deviation, SURVEY.md §1.2/§7). */
  val weiColumns: Set[String] = Set("tx_value", "tx_gasPrice", "erc20_value")

  def schemaFor(kind: TableKind, weiDecimal: Boolean): StructType = {
    val base = schemaFor(kind)
    if (!weiDecimal) base
    else StructType(base.map { f =>
      if (weiColumns.contains(f.name)) f.copy(dataType = DecimalType(38, 0)) else f
    })
  }

  /** The block-number column that range predicates push down on, per table
    * (`EthereumMetadata.java:190-199`). */
  def blockNumberColumn(kind: TableKind): String = kind match {
    case Block       => "block_number"
    case Transaction => "tx_blockNumber"
    case Erc20       => "erc20_blockNumber"
  }

  /** The block-hash column whose point lookups rewrite to a single-block
    * range (`EthereumMetadata.java:200-214`); erc20 has none. */
  def blockHashColumn(kind: TableKind): Option[String] = kind match {
    case Block       => Some("block_hash")
    case Transaction => Some("tx_blockHash")
    case Erc20       => None
  }
}
