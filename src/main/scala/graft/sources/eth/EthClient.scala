package graft.sources.eth

import java.io.{BufferedReader, FileReader}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Node-facing client abstraction — the analogue of the reference's web3j
  * provider (`EthereumWeb3jProvider.java:14-34`): exactly one backend per
  * session, constructed from options. The engine only ever talks to the chain
  * through this trait, so swapping the offline fixture backend for a live
  * JSON-RPC pool is a config change, not a code change.
  *
  * Methods mirror the RPC surface the reference uses: tip lookup
  * (`ethBlockNumber`), ranged block fetch (`ethGetBlockByNumber` with full
  * transactions + receipts), hash→number (`ethGetBlockByHash`), plus the UDF
  * RPCs (`udfs/EthereumUDFs.java:61-140`).
  */
trait EthClient extends Serializable {
  /** Current chain tip (`EthereumSplitManager.java:51`). */
  def blockNumber(): Long
  /** Stream blocks `start..end` inclusive; `fullTx=false` skips
    * materializing transactions/logs (the `ethGetBlockByNumber`
    * full-transaction-objects flag) for pruned block-only scans, and
    * `needLogs=false` skips receipt/log retrieval for transaction scans
    * that never read logs — the analogue of the reference fetching
    * receipts only on the erc20 cursor branch
    * (`EthereumLogLazyIterator.java:39`). */
  def blocks(start: Long, end: Long, fullTx: Boolean = true,
      needLogs: Boolean = true): Iterator[EthBlockData]
  /** Resolve a block hash to its number; None if unknown. */
  def blockNumberByHash(hash: String): Option[Long]
  /** Timestamp of one block (used by the timestamp→range binary search). */
  def timestampOf(blockNumber: Long): Long
  def gasPrice(): Double
  def getBalance(addr: String, atBlock: Option[Long]): Double
  def getTransactionCount(addr: String, atBlock: Option[Long]): Long
  /** Deployed bytecode, `"0x"` when not a contract (drives `isContract`). */
  def getCode(addr: String): String
  /** Batched account-state lookup: one (balance, nonce) pair per input
    * address, in input order. Default implementation is the per-address
    * scalar pair — correct for the in-process fixture backend where a
    * "round trip" is a map lookup; the JSON-RPC backend overrides it with
    * ONE batched request per call (2·N entries, the batchCall redelivery
    * contract), which is what makes the table-valued account UDF path
    * live-mode viable ([[graft.functions.Web3Functions.accountStates]]). */
  def accountStates(addrs: Seq[String],
      atBlock: Option[Long]): Seq[(Double, Long)] =
    addrs.map(a => (getBalance(a, atBlock), getTransactionCount(a, atBlock)))
}

object EthClient {
  /** Construct the client for a chain location — URI-scheme dispatch, the
    * analogue of the reference's one-of endpoint config
    * (`EthereumConnectorConfig.java:11-39`, `EthereumWeb3jProvider.java:20-30`):
    * http(s) endpoints and `ipc://<socket-path>` get the live JSON-RPC
    * backend over the matching transport (Infura is covered by https);
    * anything else is a fixture directory. */
  def forChain(chain: String): EthClient =
    if (chain.startsWith("http://") || chain.startsWith("https://") ||
        chain.startsWith("ipc://"))
      new JsonRpcChainClient(chain)
    else new FixtureChainClient(chain)

  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
}

/** Offline chain backend over the deterministic JSONL fixture layout written
  * by [[EthFixtures]]:
  *
  *   <dir>/meta.txt             tip=<N>
  *   <dir>/chain/blocks-<k>.jsonl   1024 blocks per file, one JSON per line
  *   <dir>/hash-index.txt       <block_hash> <number> per line
  *
  * Block JSON embeds transactions, and each transaction embeds its receipt
  * logs — so one "fetch" per block replaces the reference's
  * 1 + n_tx RPC round trips per block (`EthereumLogLazyIterator.java:39`).
  * Account-state calls (balance/nonce/code) are deterministic functions of
  * the address so UDF results are stable for tests.
  */
final class FixtureChainClient(chainDir: String) extends EthClient {
  import FixtureChainClient._

  /** Chain tip, re-read when `meta.txt` changes (mtime-validated cache):
    * a fixture dir can grow or be rewritten under a tip-following stream —
    * e.g. the reorg spec — and must then behave like a live chain, not a
    * snapshot pinned at first read. */
  @transient private var tipCache: (java.nio.file.attribute.FileTime, Long) = _
  private def tip: Long = {
    val p = Paths.get(chainDir, "meta.txt")
    val mt = Files.getLastModifiedTime(p)
    if (tipCache == null || tipCache._1 != mt) {
      val meta = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      val t = meta.linesIterator.collectFirst { case l if l.startsWith("tip=") => l.drop(4).toLong }
        .getOrElse(throw new IllegalStateException(s"no tip= in $chainDir/meta.txt"))
      tipCache = (mt, t)
    }
    tipCache._2
  }

  @transient private lazy val hashIndex: Map[String, Long] = {
    val m = mutable.HashMap.empty[String, Long]
    val p = Paths.get(chainDir, "hash-index.txt")
    if (Files.exists(p)) {
      val it = Files.lines(p)
      try it.forEach { l =>
        val sp = l.indexOf(' ')
        if (sp > 0) m.put(l.substring(0, sp), l.substring(sp + 1).toLong)
      } finally it.close()
    }
    m.toMap
  }

  override def blockNumber(): Long = tip

  override def blocks(start: Long, end: Long, fullTx: Boolean = true,
      needLogs: Boolean = true): Iterator[EthBlockData] = {
    val lo = math.max(1L, start)
    val hi = math.min(tip, end)
    if (lo > hi) return Iterator.empty
    val firstChunk = ((lo - 1) / BlocksPerFile) * BlocksPerFile + 1
    Iterator.range(firstChunk, hi + 1, BlocksPerFile).flatMap { chunkStart =>
      // Eager per-chunk read (≤1024 lines) so the handle closes here even
      // when the consumer stops early (LIMIT / nextOption) — a lazily
      // draining reader leaked one descriptor per abandoned iterator.
      chunkLines(chunkStart).iterator
        .map(parseBlock(_, fullTx, needLogs))
        .filter(b => b.number >= lo && b.number <= hi)
    }
  }

  /** All JSONL lines of one chunk file; empty when the chunk is absent. */
  private def chunkLines(chunkStart: Long): IndexedSeq[String] = {
    val path = Paths.get(chainDir, "chain", f"blocks-$chunkStart%07d.jsonl")
    if (!Files.exists(path)) Vector.empty
    else {
      val reader = new BufferedReader(new FileReader(path.toFile))
      try {
        val b = Vector.newBuilder[String]
        var l = reader.readLine()
        while (l != null) { b += l; l = reader.readLine() }
        b.result()
      } finally reader.close()
    }
  }

  override def blockNumberByHash(hash: String): Option[Long] = hashIndex.get(hash)

  override def timestampOf(blockNumber: Long): Long = {
    // Planning-time point probe (timestamp binary search): blocks are laid
    // out sequentially, one per line, so parse exactly the one line needed
    // instead of all 1024 blocks of the chunk per probe.
    if (blockNumber < 1 || blockNumber > tip)
      throw new IllegalStateException(s"no block $blockNumber")
    val chunkStart = ((blockNumber - 1) / BlocksPerFile) * BlocksPerFile + 1
    val lines = chunkLines(chunkStart)
    val idx = (blockNumber - chunkStart).toInt
    if (idx >= lines.size) throw new IllegalStateException(s"no block $blockNumber")
    val b = parseBlock(lines(idx), fullTx = false)
    if (b.number == blockNumber) b.timestamp
    else lines.iterator.map(parseBlock(_, fullTx = false))
      .collectFirst { case blk if blk.number == blockNumber => blk.timestamp }
      .getOrElse(throw new IllegalStateException(s"no block $blockNumber"))
  }

  override def gasPrice(): Double = 21.0e9

  override def getBalance(addr: String, atBlock: Option[Long]): Double = {
    val h = addrSeed(addr)
    val at = atBlock.getOrElse(tip)
    ((h % 1000000L) * 1.0e15) + at * 1.0e9
  }

  override def getTransactionCount(addr: String, atBlock: Option[Long]): Long = {
    val h = addrSeed(addr)
    val at = atBlock.getOrElse(tip)
    (h % 497L) + at / 1024L
  }

  override def getCode(addr: String): String =
    if (Erc20Decoder.tokenBySymbolAddr.valuesIterator.exists(_.equalsIgnoreCase(addr)) ||
        addrSeed(addr) % 5L == 0L) "0x60606040" else "0x"

  private def addrSeed(addr: String): Long =
    new java.math.BigInteger(EthClient.sha256Hex(addr.toLowerCase).take(15), 16).longValue()
}

object FixtureChainClient {
  val BlocksPerFile = 1024L

  private val mapper = new ObjectMapper()

  private def strs(n: JsonNode): Vector[String] = {
    val b = Vector.newBuilder[String]
    n.forEach(e => b += e.asText())
    b.result()
  }

  def parseBlock(line: String, fullTx: Boolean = true,
      needLogs: Boolean = true): EthBlockData = {
    val j = mapper.readTree(line)
    val number = j.get("number").asLong()
    val hash = j.get("hash").asText()
    val txs = Vector.newBuilder[EthTx]
    var idx = 0
    if (fullTx) j.get("transactions").forEach { t =>
      val txHash = t.get("hash").asText()
      val logs = Vector.newBuilder[EthLog]
      if (needLogs) t.get("logs").forEach { l =>
        logs += EthLog(
          address = l.get("address").asText(),
          topics = strs(l.get("topics")),
          data = l.get("data").asText(),
          transactionHash = txHash,
          blockNumber = number)
      }
      txs += EthTx(
        hash = txHash,
        nonce = t.get("nonce").asLong(),
        blockHash = hash,
        blockNumber = number,
        transactionIndex = idx,
        from = t.get("from").asText(),
        to = Option(t.get("to")).filter(!_.isNull).map(_.asText()),
        value = t.get("value").asDouble(),
        gas = t.get("gas").asDouble(),
        gasPrice = t.get("gasPrice").asDouble(),
        input = t.get("input").asText(),
        logs = logs.result())
      idx += 1
    }
    EthBlockData(
      number = number,
      hash = hash,
      parentHash = j.get("parentHash").asText(),
      nonce = j.get("nonce").asText(),
      sha3Uncles = j.get("sha3Uncles").asText(),
      logsBloom = j.get("logsBloom").asText(),
      transactionsRoot = j.get("transactionsRoot").asText(),
      stateRoot = j.get("stateRoot").asText(),
      miner = j.get("miner").asText(),
      difficulty = j.get("difficulty").asLong(),
      totalDifficulty = j.get("totalDifficulty").asLong(),
      size = j.get("size").asInt(),
      extraData = j.get("extraData").asText(),
      gasLimit = j.get("gasLimit").asDouble(),
      gasUsed = j.get("gasUsed").asDouble(),
      timestamp = j.get("timestamp").asLong(),
      uncles = strs(j.get("uncles")),
      transactions = txs.result())
  }
}
