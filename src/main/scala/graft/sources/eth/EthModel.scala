package graft.sources.eth

/** In-memory model of chain data as a node/fixture hands it to the engine.
  * Logs ride on their transaction (the fixture analogue of fetching the tx
  * receipt, cf. `EthereumLogLazyIterator.java:29-61`).
  */
final case class EthLog(
    address: String,
    topics: Vector[String],
    data: String,
    transactionHash: String,
    blockNumber: Long)

final case class EthTx(
    hash: String,
    nonce: Long,
    blockHash: String,
    blockNumber: Long,
    transactionIndex: Int,
    from: String,
    to: Option[String],
    value: Double,
    gas: Double,
    gasPrice: Double,
    input: String,
    logs: Vector[EthLog])

final case class EthBlockData(
    number: Long,
    hash: String,
    parentHash: String,
    nonce: String,
    sha3Uncles: String,
    logsBloom: String,
    transactionsRoot: String,
    stateRoot: String,
    miner: String,
    difficulty: Long,
    totalDifficulty: Long,
    size: Int,
    extraData: String,
    gasLimit: Double,
    gasUsed: Double,
    timestamp: Long,
    uncles: Vector[String],
    transactions: Vector[EthTx])
