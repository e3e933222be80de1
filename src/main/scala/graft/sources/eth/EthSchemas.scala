package graft.sources.eth

import org.apache.spark.sql.types._

/** Table kinds + fixed schemas of the ethereum source.
  *
  * Column names, order and types mirror the reference's hard-coded catalog
  * (`EthereumMetadata.java:98-147`, golden `DESCRIBE` at `README.md:138-186`).
  * Presto bounded `varchar(n)` maps to Spark `StringType` carrying the
  * char/varchar DDL metadata key, so `DESCRIBE` restores the reference's
  * exact widths (18/42/66/514, `EthereumMetadata.java:48-51`) while runtime
  * semantics stay plain string; Presto BIGINT/INTEGER/DOUBLE map 1:1.
  */
object EthSchemas {
  // Reference hash-string widths (EthereumMetadata.java:48-51): 0x + 2 hex
  // chars per byte for 8/20/32/256-byte values.
  val H8 = 18; val H20 = 42; val H32 = 66; val H256 = 514

  private def varcharMeta(ddl: String): Metadata =
    new MetadataBuilder()
      .putString(CharVarcharUtilsKey, ddl).build()
  /** Spark's char/varchar DDL restoration key (CharVarcharUtils). */
  private val CharVarcharUtilsKey = "__CHAR_VARCHAR_TYPE_STRING"
  /** Bounded varchar column: StringType + restorable `varchar(n)` DDL. */
  private def vc(name: String, n: Int, nullable: Boolean = true): StructField =
    StructField(name, StringType, nullable, varcharMeta(s"varchar($n)"))
  private def vcArray(name: String, n: Int): StructField =
    StructField(name, ArrayType(StringType), nullable = true, varcharMeta(s"array<varchar($n)>"))

  val allTables: Seq[String] = Seq("block", "transaction", "erc20")

  sealed abstract class TableKind(val name: String)
  case object Block extends TableKind("block")
  case object Transaction extends TableKind("transaction")
  case object Erc20 extends TableKind("erc20")
  /** Extension beyond the reference's 3 tables: the raw receipt-log stream
    * (block→logs fan-out) for users who decode with [[graft.functions.Erc20TransfersGenerator]]
    * or their own ABI logic. Reachable via `format("ethereum")` only — the
    * catalog lists exactly the reference's tables. */
  case object Log extends TableKind("log")

  def kindOf(name: String): TableKind = name.toLowerCase match {
    case "block"       => Block
    case "transaction" => Transaction
    case "erc20"       => Erc20
    case "log"         => Log
    case other => throw new IllegalArgumentException(
      s"unknown ethereum table '$other' (expected block|transaction|erc20|log)")
  }

  val blockSchema: StructType = StructType(Seq(
    StructField("block_number", LongType, nullable = false),
    vc("block_hash", H32, nullable = false),
    vc("block_parentHash", H32),
    vc("block_nonce", H8),
    vc("block_sha3Uncles", H32),
    vc("block_logsBloom", H256),
    vc("block_transactionsRoot", H32),
    vc("block_stateRoot", H32),
    vc("block_miner", H20),
    StructField("block_difficulty", LongType),
    StructField("block_totalDifficulty", LongType),
    StructField("block_size", IntegerType),
    StructField("block_extraData", StringType),
    StructField("block_gasLimit", DoubleType),
    StructField("block_gasUsed", DoubleType),
    StructField("block_timestamp", LongType),
    vcArray("block_transactions", H32),
    vcArray("block_uncles", H32)))

  val transactionSchema: StructType = StructType(Seq(
    vc("tx_hash", H32, nullable = false),
    StructField("tx_nonce", LongType),
    vc("tx_blockHash", H32),
    StructField("tx_blockNumber", LongType),
    StructField("tx_transactionIndex", IntegerType),
    vc("tx_from", H20),
    vc("tx_to", H20),
    StructField("tx_value", DoubleType),
    StructField("tx_gas", DoubleType),
    StructField("tx_gasPrice", DoubleType),
    StructField("tx_input", StringType)))

  val erc20Schema: StructType = StructType(Seq(
    StructField("erc20_token", StringType),
    vc("erc20_from", H20),
    vc("erc20_to", H20),
    StructField("erc20_value", DoubleType),
    vc("erc20_txHash", H32),
    StructField("erc20_blockNumber", LongType)))

  val logSchema: StructType = StructType(Seq(
    vc("log_address", H20),
    StructField("log_topics", ArrayType(StringType)),
    StructField("log_data", StringType),
    vc("log_txHash", H32),
    StructField("log_blockNumber", LongType, nullable = false)))

  def schemaFor(kind: TableKind): StructType = kind match {
    case Block       => blockSchema
    case Transaction => transactionSchema
    case Erc20       => erc20Schema
    case Log         => logSchema
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

  /** Schema with the bounded-varchar DDL *restored to real types*
    * (`varchar(66)` etc) — what the [[EthereumCatalog]] exposes so
    * `DESCRIBE` prints the reference's widths; Spark stringifies it again
    * at scan time. */
  def rawSchemaFor(kind: TableKind): StructType =
    org.apache.spark.sql.catalyst.util.CharVarcharUtils.getRawSchema(schemaFor(kind))

  /** The block-number column that range predicates push down on, per table
    * (`EthereumMetadata.java:190-199`). */
  def blockNumberColumn(kind: TableKind): String = kind match {
    case Block       => "block_number"
    case Transaction => "tx_blockNumber"
    case Erc20       => "erc20_blockNumber"
    case Log         => "log_blockNumber"
  }

  /** The block-hash column whose point lookups rewrite to a single-block
    * range (`EthereumMetadata.java:200-214`); erc20 has none. */
  def blockHashColumn(kind: TableKind): Option[String] = kind match {
    case Block       => Some("block_hash")
    case Transaction => Some("tx_blockHash")
    case Erc20       => None
    case Log         => None
  }
}
