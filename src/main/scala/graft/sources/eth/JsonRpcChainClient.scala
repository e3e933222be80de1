package graft.sources.eth

import java.math.BigInteger
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Live chain backend over Ethereum JSON-RPC 2.0 — the analogue of the
  * reference's web3j provider (`EthereumWeb3jProvider.java:14-34`,
  * endpoints configured in `EthereumConnectorConfig.java:11-39`). Selected
  * by [[EthClient.forChain]] when the chain location is an http(s) or
  * `ipc://` URI: the same request construction, batching, retry, and
  * response handling run over either transport, mirroring the reference's
  * one-of HTTP / Unix IPC / Infura provider choice
  * (`EthereumWeb3jProvider.java:20-30`, `UnixIpcService` at `:26` —
  * Infura is plain HTTPS JSON-RPC and needs no separate path).
  *
  * RPC usage mirrors the reference connector:
  *  - `eth_blockNumber` for the tip (`EthereumSplitManager.java:51`)
  *  - `eth_getBlockByNumber` with full transaction objects for scans
  *  - `eth_getTransactionReceipt` for ERC-20 logs
  *    (`EthereumLogLazyIterator.java:39`) — but batched per block with
  *    JSON-RPC array batching instead of one round trip per transaction
  *  - `eth_getBlockByHash` for hash point lookups
  *  - `eth_getBalance` / `eth_getTransactionCount` / `eth_getCode` /
  *    `eth_gasPrice` for the UDFs (`udfs/EthereumUDFs.java:61-140`)
  *
  * Block fetches are batched (`batchSize` blocks per HTTP round trip), so a
  * 512-block partition costs ~4 block batches + 1 receipt batch per block
  * with transactions, not 512·(1+n_tx) round trips.
  */
final class JsonRpcChainClient(endpoint: String, batchSize: Int = 128,
    maxRetries: Int = 3, retryBackoffMs: Long = 250) extends EthClient {
  import JsonRpcChainClient._

  override def blockNumber(): Long =
    hexToLong(call("eth_blockNumber"))

  override def blocks(start: Long, end: Long, fullTx: Boolean = true,
      needLogs: Boolean = true): Iterator[EthBlockData] = {
    if (start > end) return Iterator.empty
    Iterator.range(start, end + 1, batchSize.toLong).flatMap { lo =>
      val hi = math.min(end, lo + batchSize - 1)
      val reqs = (lo to hi).map(n => ("eth_getBlockByNumber", params(hexQty(n), fullTx)))
      val got = batchCall(reqs)
      // Scans are tip-bounded at planning time, so a null answer for an
      // in-range block is data loss (lagging replica, pruned node), never
      // a legitimate "no such block" — fail loudly instead of emitting a
      // silently incomplete table. (Dropped batch entries were already
      // re-requested and error inside batchCall.)
      val missing = (lo to hi).zip(got).collect { case (n, r) if r.isNull => n }
      if (missing.nonEmpty)
        throw new IllegalStateException(
          s"node $endpoint returned null for in-range block(s) " +
            missing.take(8).mkString(", ") +
            (if (missing.size > 8) s" (+${missing.size - 8} more)" else "") +
            " — blocks at or below the planned tip must exist")
      got.iterator
        // receipts cost one extra RPC batch per block — fetch them only
        // when the scan actually reads logs (erc20/log table kinds)
        .map(b => parseRpcBlock(b,
          if (fullTx && needLogs) receiptLogs(b) else Map.empty, fullTx))
    }
  }

  /** Receipts for every transaction of one block, one JSON-RPC batch. */
  private def receiptLogs(block: JsonNode): Map[String, Vector[EthLog]] = {
    val hashes = Vector.newBuilder[String]
    block.get("transactions").forEach(t => hashes += t.get("hash").asText())
    val hs = hashes.result()
    if (hs.isEmpty) return Map.empty
    val rs = batchCall(hs.map(h => ("eth_getTransactionReceipt", params(h))))
    hs.zip(rs).map { case (h, r) =>
      val logs = Vector.newBuilder[EthLog]
      if (!r.isNull && r.has("logs")) r.get("logs").forEach { l =>
        logs += EthLog(
          address = l.get("address").asText(),
          topics = strings(l.get("topics")),
          data = l.get("data").asText(),
          transactionHash = h,
          blockNumber = hexToLong(l.get("blockNumber")))
      }
      h -> logs.result()
    }.toMap
  }

  override def blockNumberByHash(hash: String): Option[Long] = {
    val b = call("eth_getBlockByHash", params(hash, false))
    if (b.isNull) None else Some(hexToLong(b.get("number")))
  }

  override def timestampOf(blockNumber: Long): Long = {
    val b = call("eth_getBlockByNumber", params(hexQty(blockNumber), false))
    if (b.isNull) throw new IllegalStateException(s"no block $blockNumber")
    hexToLong(b.get("timestamp"))
  }

  override def gasPrice(): Double = hexToDouble(call("eth_gasPrice"))

  override def getBalance(addr: String, atBlock: Option[Long]): Double =
    hexToDouble(call("eth_getBalance", params(addr, blockParam(atBlock))))

  override def getTransactionCount(addr: String, atBlock: Option[Long]): Long =
    hexToLong(call("eth_getTransactionCount", params(addr, blockParam(atBlock))))

  override def getCode(addr: String): String =
    call("eth_getCode", params(addr, "latest")).asText()

  /** One JSON-RPC batch per call: 2·N interleaved balance/nonce requests
    * ride [[batchCall]]'s ordered-redelivery contract, so N addresses cost
    * ONE HTTP round trip instead of 2·N — the scalar-UDF path's per-row
    * sync RPC is reference-faithful but a live-mode scale killer
    * (`udfs/EthereumUDFs.java:75-114` issues one blocking call per row). */
  override def accountStates(addrs: Seq[String],
      atBlock: Option[Long]): Seq[(Double, Long)] = {
    if (addrs.isEmpty) return Nil
    val blk = blockParam(atBlock)
    val reqs = addrs.flatMap(a => Seq(
      ("eth_getBalance", params(a, blk)),
      ("eth_getTransactionCount", params(a, blk))))
    val res = batchCall(reqs)
    addrs.indices.map(i => (hexToDouble(res(2 * i)), hexToLong(res(2 * i + 1))))
  }

  private def blockParam(atBlock: Option[Long]): String =
    atBlock.map(hexQty).getOrElse("latest")

  // ---- transport ----

  private def call(method: String, ps: ArrayNode = mapper.createArrayNode()): JsonNode = {
    val req = rpcRequest(method, ps, 1)
    result(post(mapper.writeValueAsBytes(req)), method)
  }

  /** Batched JSON-RPC with per-request delivery guarantees: one round trip
    * for N requests, results returned in request order (batch responses may
    * arrive in any order — re-sorted by id). Responses with an unmatchable
    * id — `"id": null` (spec-allowed for requests the server could not
    * parse) or outside the requested set — fail with a descriptive error
    * instead of an NPE/index crash.
    *
    * Requests the server silently dropped (no response object carries their
    * id) are RE-ISSUED in a follow-up batch, bounded by `maxRetries`; if
    * entries are still unanswered after that, the call throws `IOException`
    * listing them, so the scan aborts loudly rather than yielding silently
    * missing rows. An answered JSON `null` result passes through — null IS
    * the valid answer for some methods (unknown hash, missing receipt) and
    * per-method callers decide its meaning. */
  private def batchCall(reqs: Seq[(String, ArrayNode)]): Vector[JsonNode] = {
    val out = new Array[JsonNode](reqs.size) // Scala null = not yet answered
    var pending: Vector[Int] = reqs.indices.toVector
    var attempt = 0
    while (pending.nonEmpty) {
      val arr = mapper.createArrayNode()
      pending.foreach { i => val (m, ps) = reqs(i); arr.add(rpcRequest(m, ps, i)) }
      val resp = post(mapper.writeValueAsBytes(arr))
      if (!resp.isArray)
        throw new java.io.IOException(s"expected batch array from $endpoint, got: ${resp.getNodeType}")
      val pendingSet = pending.toSet
      resp.forEach { r =>
        val idNode = r.get("id")
        if (idNode == null || !idNode.isNumber || !pendingSet.contains(idNode.asInt()))
          throw new IllegalStateException(
            s"JSON-RPC batch response with unmatchable id from $endpoint: " +
              r.toString.take(300))
        // absent "result" key leaves the slot unanswered -> re-requested;
        // an explicit "result": null is an answer (Jackson NullNode)
        out(idNode.asInt()) = result(r, "batch")
      }
      pending = pending.filter(i => out(i) == null)
      if (pending.nonEmpty) {
        if (attempt >= maxRetries)
          throw new java.io.IOException(
            s"JSON-RPC batch from $endpoint left ${pending.size} request(s) unanswered " +
              s"after $attempt retries: " +
              pending.take(8).map(i => s"${reqs(i)._1}(id=$i)").mkString(", ") +
              (if (pending.size > 8) " ..." else ""))
        attempt += 1
        Thread.sleep(retryBackoffMs * attempt)
      }
    }
    out.toVector
  }

  private def rpcRequest(method: String, ps: ArrayNode, id: Int): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("jsonrpc", "2.0"); o.put("id", id); o.put("method", method)
    o.set[JsonNode]("params", ps)
    o
  }

  private def result(resp: JsonNode, ctx: String): JsonNode = {
    val err = resp.get("error")
    if (err != null && !err.isNull)
      // deliberately NOT IOException: protocol errors are deterministic
      // and must not be retried by the transport loop
      throw new IllegalStateException(s"JSON-RPC error in $ctx: ${err.toString}")
    resp.get("result")
  }

  private def params(vs: Any*): ArrayNode = {
    val a = mapper.createArrayNode()
    vs.foreach {
      case s: String  => a.add(s)
      case b: Boolean => a.add(b)
      case other      => a.add(other.toString)
    }
    a
  }

  /** All RPC reads are idempotent, so transient transport failures retry
    * with linear backoff; JSON-RPC *protocol* errors (error objects in a
    * 200 response) do not — they are deterministic. */
  private def post(body: Array[Byte]): JsonNode = {
    var attempt = 0
    while (true) {
      try return postOnce(body)
      catch {
        case e: java.io.IOException if attempt < maxRetries =>
          attempt += 1
          Thread.sleep(retryBackoffMs * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  @transient private lazy val transport: RpcTransport =
    if (endpoint.startsWith("ipc://"))
      new IpcTransport(endpoint.stripPrefix("ipc://"))
    else new HttpTransport(endpoint)

  private def postOnce(body: Array[Byte]): JsonNode = transport.exchange(body)
}

/** One JSON-RPC exchange: request bytes out, parsed response tree back.
  * Implementations throw `IOException` for transient transport failures
  * (the retry loop's contract). */
private[graft] trait RpcTransport extends Serializable {
  def exchange(body: Array[Byte]): JsonNode
}

/** HTTP(S) POST transport — one connection per exchange. */
private[eth] final class HttpTransport(endpoint: String) extends RpcTransport {
  override def exchange(body: Array[Byte]): JsonNode = {
    val conn = URI.create(endpoint).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Content-Type", "application/json")
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(120000)
    conn.setDoOutput(true)
    val os = conn.getOutputStream
    try os.write(body) finally os.close()
    val code = conn.getResponseCode
    if (code != 200)
      throw new java.io.IOException(s"JSON-RPC HTTP $code from $endpoint")
    val is = conn.getInputStream
    try JsonRpcChainClient.mapper.readTree(is) finally is.close()
  }
}

/** Unix-domain-socket transport (geth `--ipcpath`-style endpoints) — the
  * analogue of the reference's `UnixIpcService` mode
  * (`EthereumWeb3jProvider.java:26`). Framing follows geth's IPC codec:
  * one compact JSON value per request, responses newline-terminated (JSON
  * string escapes keep raw newlines out of the payload, so the trailing
  * `\n` is an unambiguous frame boundary). One connection per exchange,
  * like the HTTP transport — connect failures surface as `IOException`
  * and retry. */
private[graft] final class IpcTransport(path: String,
    connectTimeoutMs: Long = 30000, readTimeoutMs: Long = 120000)
  extends RpcTransport {
  import java.nio.ByteBuffer
  import java.nio.channels.{SelectionKey, Selector, SocketChannel}

  /** Deadline-bounded exchange: a stalled or dead geth socket surfaces as
    * `IOException` (so the client's transport retry contract applies)
    * instead of wedging the scan forever — the same 30s/120s envelope the
    * HTTP transport gets from `setConnectTimeout`/`setReadTimeout`. Unix
    * sockets have no built-in timeout, so the channel runs non-blocking
    * under a `Selector` with an explicit deadline per phase. */
  override def exchange(body: Array[Byte]): JsonNode = {
    val ch = SocketChannel.open(java.net.StandardProtocolFamily.UNIX)
    val sel = Selector.open()
    try {
      ch.configureBlocking(false)
      if (!ch.connect(java.net.UnixDomainSocketAddress.of(path))) {
        ch.register(sel, SelectionKey.OP_CONNECT)
        awaitReady(sel, connectTimeoutMs, s"IPC connect to $path")
        if (!ch.finishConnect())
          throw new java.io.IOException(s"IPC connect to $path failed")
      }
      val deadline = System.nanoTime() + readTimeoutMs * 1000000L
      def remainingMs: Long = {
        val ms = (deadline - System.nanoTime()) / 1000000L
        if (ms <= 0)
          throw new java.io.IOException(
            s"IPC exchange with $path timed out after ${readTimeoutMs}ms")
        ms
      }
      val out = ByteBuffer.allocate(body.length + 1)
      out.put(body); out.put('\n'.toByte); out.flip()
      ch.register(sel, SelectionKey.OP_WRITE)
      while (out.hasRemaining) {
        awaitReady(sel, remainingMs, s"IPC write to $path")
        ch.write(out)
      }
      ch.register(sel, SelectionKey.OP_READ)
      val acc = new java.io.ByteArrayOutputStream()
      val rb = ByteBuffer.allocate(8192)
      var done = false
      while (!done) {
        awaitReady(sel, remainingMs, s"IPC read from $path")
        rb.clear()
        val n = ch.read(rb)
        if (n < 0) {
          if (acc.size() == 0)
            throw new java.io.IOException(s"IPC endpoint $path closed without a response")
          done = true
        } else if (n > 0) {
          acc.write(rb.array(), 0, n)
          // JSON string escaping keeps raw newlines out of the payload, so
          // the frame ends exactly when a chunk ends in '\n' — checking the
          // last byte of THIS read keeps accumulation O(n), no per-chunk
          // re-materialization of the whole buffer
          if (rb.array()(n - 1) == '\n'.toByte) done = true
        }
      }
      JsonRpcChainClient.mapper.readTree(acc.toByteArray)
    } finally {
      sel.close(); ch.close()
    }
  }

  /** Block until the registered channel is ready or `timeoutMs` elapses;
    * timeout is `IOException` so the retry loop treats it as transient. */
  private def awaitReady(sel: Selector, timeoutMs: Long, what: String): Unit = {
    if (sel.select(math.max(1L, timeoutMs)) == 0)
      throw new java.io.IOException(s"$what timed out after ${timeoutMs}ms")
    sel.selectedKeys().clear()
  }
}

object JsonRpcChainClient {
  private[eth] val mapper = new ObjectMapper()

  def hexQty(n: Long): String = "0x" + java.lang.Long.toHexString(n)

  private def hexBig(n: JsonNode): BigInteger = {
    val s = n.asText()
    val h = if (s.startsWith("0x") || s.startsWith("0X")) s.substring(2) else s
    if (h.isEmpty) BigInteger.ZERO else new BigInteger(h, 16)
  }
  /** Hex quantity → long. Quantities wider than 63 bits (mainnet
    * totalDifficulty) truncate to the low 64 bits — same width limit as the
    * reference's BIGINT columns (`EthereumMetadata.java:57-66`). */
  def hexToLong(n: JsonNode): Long = hexBig(n).longValue()
  /** Hex quantity → double (wei values exceed long range). */
  def hexToDouble(n: JsonNode): Double = hexBig(n).doubleValue()
  /** Optional hex quantity: modern nodes omit fields the pre-merge chain
    * always had (post-merge Geth drops `totalDifficulty`; type-2 EIP-1559
    * transactions may omit `gasPrice`) — absent/null defaults instead of
    * crashing the scan. */
  def hexToLongOpt(n: JsonNode, default: Long = 0L): Long =
    if (n == null || n.isNull) default else hexToLong(n)
  def hexToDoubleOpt(n: JsonNode, default: Double = 0.0): Double =
    if (n == null || n.isNull) default else hexToDouble(n)

  private def strings(n: JsonNode): Vector[String] = {
    val b = Vector.newBuilder[String]
    n.forEach(e => b += e.asText())
    b.result()
  }

  /** Standard `eth_getBlockByNumber` response object → [[EthBlockData]],
    * with per-transaction receipt logs merged in. */
  def parseRpcBlock(j: JsonNode, logsByTx: Map[String, Vector[EthLog]],
      fullTx: Boolean): EthBlockData = {
    val number = hexToLong(j.get("number"))
    val hash = j.get("hash").asText()
    // post-London blocks carry the base fee needed to reconstruct a type-2
    // transaction's effective gas price when the node omits `gasPrice`
    val baseFee: Option[BigInteger] =
      Option(j.get("baseFeePerGas")).filterNot(_.isNull).map(hexBig)
    val txs = Vector.newBuilder[EthTx]
    var idx = 0
    if (fullTx) j.get("transactions").forEach { t =>
      val txHash = t.get("hash").asText()
      txs += EthTx(
        hash = txHash,
        nonce = hexToLong(t.get("nonce")),
        blockHash = hash,
        blockNumber = number,
        transactionIndex = idx,
        from = t.get("from").asText(),
        to = Option(t.get("to")).filter(!_.isNull).map(_.asText()),
        value = hexToDouble(t.get("value")),
        gas = hexToDouble(t.get("gas")),
        // EIP-1559 type-2 txs: when the node omits `gasPrice`, reconstruct
        // the EFFECTIVE price min(baseFee + maxPriorityFeePerGas, maxFeePerGas)
        // — what the sender actually paid — rather than the fee cap, which
        // overstates it; the bare cap is the fallback only when the block
        // predates London or omits baseFeePerGas, 0 when nothing exists
        gasPrice =
          if (t.hasNonNull("gasPrice")) hexToDouble(t.get("gasPrice"))
          else {
            val cap = Option(t.get("maxFeePerGas")).filterNot(_.isNull).map(hexBig)
            val tip = Option(t.get("maxPriorityFeePerGas")).filterNot(_.isNull)
              .map(hexBig).getOrElse(BigInteger.ZERO)
            (baseFee, cap) match {
              case (Some(b), Some(c)) => b.add(tip).min(c).doubleValue()
              case (None, Some(c))    => c.doubleValue()
              case _                  => 0.0
            }
          },
        input = t.get("input").asText(),
        logs = logsByTx.getOrElse(txHash, Vector.empty))
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
      difficulty = hexToLongOpt(j.get("difficulty")),
      totalDifficulty = hexToLongOpt(j.get("totalDifficulty")),
      size = hexToLong(j.get("size")).toInt,
      extraData = j.get("extraData").asText(),
      gasLimit = hexToDouble(j.get("gasLimit")),
      gasUsed = hexToDouble(j.get("gasUsed")),
      timestamp = hexToLong(j.get("timestamp")),
      uncles = strings(j.get("uncles")),
      transactions = txs.result())
  }
}
