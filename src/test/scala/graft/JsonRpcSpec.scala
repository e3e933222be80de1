package graft

import java.math.BigInteger
import java.net.InetSocketAddress

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.eth._

/** In-process JSON-RPC stub server: standard Ethereum RPC (hex quantities,
  * receipt objects, batch requests) answered from the deterministic fixture
  * chain — no egress. Lets the live [[JsonRpcChainClient]] be exercised
  * end-to-end against known data. */
object RpcStubServer {
  private val mapper = new ObjectMapper()

  def hex(n: Long): String = "0x" + java.lang.Long.toHexString(n)
  /** Exact double→hex for the fixture's integer-valued doubles. */
  def hex(d: Double): String =
    "0x" + java.math.BigDecimal.valueOf(d).toBigInteger.toString(16)

  def renderTx(t: EthTx): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("hash", t.hash); o.put("nonce", hex(t.nonce))
    o.put("blockHash", t.blockHash); o.put("blockNumber", hex(t.blockNumber))
    o.put("transactionIndex", hex(t.transactionIndex.toLong))
    o.put("from", t.from)
    t.to match { case Some(a) => o.put("to", a); case None => o.putNull("to") }
    o.put("value", hex(t.value)); o.put("gas", hex(t.gas)); o.put("gasPrice", hex(t.gasPrice))
    o.put("input", t.input)
    o
  }
  def renderBlock(b: EthBlockData, fullTx: Boolean): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("number", hex(b.number)); o.put("hash", b.hash); o.put("parentHash", b.parentHash)
    o.put("nonce", b.nonce); o.put("sha3Uncles", b.sha3Uncles); o.put("logsBloom", b.logsBloom)
    o.put("transactionsRoot", b.transactionsRoot); o.put("stateRoot", b.stateRoot)
    o.put("miner", b.miner); o.put("difficulty", hex(b.difficulty))
    o.put("totalDifficulty", hex(b.totalDifficulty)); o.put("size", hex(b.size.toLong))
    o.put("extraData", b.extraData); o.put("gasLimit", hex(b.gasLimit))
    o.put("gasUsed", hex(b.gasUsed)); o.put("timestamp", hex(b.timestamp))
    val us = mapper.createArrayNode(); b.uncles.foreach(us.add); o.set[JsonNode]("uncles", us)
    val ts = mapper.createArrayNode()
    if (fullTx) b.transactions.foreach(t => ts.add(renderTx(t)))
    else b.transactions.foreach(t => ts.add(t.hash))
    o.set[JsonNode]("transactions", ts)
    o
  }

  /** Per-request responder answering from the fixture chain (blocks
    * `1..maxBlock`); shared by the HTTP and IPC stub servers. When
    * `counts` is given, every served method increments its entry. */
  def responder(chainDir: String, maxBlock: Long,
      counts: java.util.concurrent.ConcurrentHashMap[String, java.lang.Long] = null): JsonNode => JsonNode = {
    val fixture = EthClient.forChain(chainDir)
    val blocks: Map[Long, EthBlockData] =
      fixture.blocks(1, maxBlock).map(b => b.number -> b).toMap
    val byHash: Map[String, EthBlockData] = blocks.values.map(b => b.hash -> b).toMap
    val txLogs: Map[String, (Long, Vector[EthLog])] =
      blocks.values.flatMap(b => b.transactions.map(t => t.hash -> (b.number, t.logs))).toMap

    def renderReceipt(txHash: String): JsonNode = txLogs.get(txHash) match {
      case None => mapper.nullNode()
      case Some((blockNum, logs)) =>
        val o = mapper.createObjectNode()
        o.put("transactionHash", txHash)
        val ls = mapper.createArrayNode()
        logs.foreach { l =>
          val lo = mapper.createObjectNode()
          lo.put("address", l.address); lo.put("data", l.data)
          lo.put("transactionHash", txHash); lo.put("blockNumber", hex(blockNum))
          val tops = mapper.createArrayNode(); l.topics.foreach(tops.add)
          lo.set[JsonNode]("topics", tops)
          ls.add(lo)
        }
        o.set[JsonNode]("logs", ls)
        o
    }
    def qty(n: JsonNode): Long = new BigInteger(n.asText().drop(2), 16).longValue()
    def blockParam(n: JsonNode): Option[Long] = n.asText() match {
      case "latest" | "pending" => None
      case "earliest"           => Some(1L)
      case h                    => Some(new BigInteger(h.drop(2), 16).longValue())
    }

    def answer(req: JsonNode): JsonNode = {
      val ps = req.get("params")
      if (counts != null)
        counts.merge(req.get("method").asText(), 1L, (a, b) => a + b)
      val result: JsonNode = req.get("method").asText() match {
        // a self-consistent node never advertises blocks it cannot serve —
        // the strict client treats null for an in-range block as data loss
        case "eth_blockNumber" =>
          mapper.getNodeFactory.textNode(hex(math.min(fixture.blockNumber(), maxBlock)))
        case "eth_getBlockByNumber" =>
          blocks.get(qty(ps.get(0))).map(renderBlock(_, ps.get(1).asBoolean()))
            .getOrElse(mapper.nullNode()): JsonNode
        case "eth_getBlockByHash" =>
          byHash.get(ps.get(0).asText()).map(renderBlock(_, ps.get(1).asBoolean()))
            .getOrElse(mapper.nullNode()): JsonNode
        case "eth_getTransactionReceipt" => renderReceipt(ps.get(0).asText())
        case "eth_gasPrice" => mapper.getNodeFactory.textNode(hex(fixture.gasPrice()))
        case "eth_getBalance" =>
          mapper.getNodeFactory.textNode(hex(fixture.getBalance(ps.get(0).asText(), blockParam(ps.get(1)))))
        case "eth_getTransactionCount" =>
          mapper.getNodeFactory.textNode(hex(fixture.getTransactionCount(ps.get(0).asText(), blockParam(ps.get(1)))))
        case "eth_getCode" => mapper.getNodeFactory.textNode(fixture.getCode(ps.get(0).asText()))
        case m => throw new IllegalArgumentException(s"unsupported method $m")
      }
      val resp = mapper.createObjectNode()
      resp.put("jsonrpc", "2.0")
      resp.set[JsonNode]("id", req.get("id"))
      resp.set[JsonNode]("result", result)
      resp
    }

    answer _
  }

  /** Single or batch request body → response body. */
  private def handleBody(answer: JsonNode => JsonNode, body: JsonNode): JsonNode =
    if (body.isArray) {
      val arr = mapper.createArrayNode()
      body.forEach(r => arr.add(answer(r)))
      arr
    } else answer(body)

  /** HTTP stub server over [[responder]]. */
  def start(chainDir: String, maxBlock: Long,
      counts: java.util.concurrent.ConcurrentHashMap[String, java.lang.Long] = null): HttpServer = {
    val answer = responder(chainDir, maxBlock, counts)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      try {
        if (counts != null) counts.merge("__http_exchanges__", 1L, (a, b) => a + b)
        val body = mapper.readTree(ex.getRequestBody)
        val bytes = mapper.writeValueAsBytes(handleBody(answer, body))
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
      } finally ex.close()
    })
    server.start()
    server
  }

  /** Unix-domain-socket stub server speaking geth's IPC framing (one
    * newline-terminated JSON value per exchange) over the SAME responder
    * as the HTTP stub — the differential target for the `ipc://` mode. */
  def startIpc(chainDir: String, maxBlock: Long,
      socketPath: String): java.nio.channels.ServerSocketChannel = {
    val answer = responder(chainDir, maxBlock)
    val ssc = java.nio.channels.ServerSocketChannel.open(java.net.StandardProtocolFamily.UNIX)
    ssc.bind(java.net.UnixDomainSocketAddress.of(socketPath))
    val t = new Thread(() => {
      try {
        while (true) {
          val ch = ssc.accept()
          try {
            val acc = new java.io.ByteArrayOutputStream()
            val rb = java.nio.ByteBuffer.allocate(8192)
            var done = false
            while (!done) {
              rb.clear()
              val n = ch.read(rb)
              if (n < 0) done = true
              else if (n > 0) {
                acc.write(rb.array(), 0, n)
                if (acc.toByteArray.last == '\n'.toByte) done = true
              }
            }
            val body = mapper.readTree(acc.toByteArray)
            val bytes = mapper.writeValueAsBytes(handleBody(answer, body)) :+ '\n'.toByte
            val out = java.nio.ByteBuffer.wrap(bytes)
            while (out.hasRemaining) ch.write(out)
          } finally ch.close()
        }
      } catch {
        case _: java.nio.channels.ClosedChannelException => ()
        case _: java.nio.channels.AsynchronousCloseException => ()
      }
    })
    t.setDaemon(true)
    t.start()
    ssc
  }
}

/** The live JSON-RPC backend must produce byte-identical scan results to
  * the fixture backend when the RPC endpoint replays the same chain. */
class JsonRpcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val dir = EthFixtures.ensure(spark)

  private def withServer[A](maxBlock: Long)(f: String => A): A = {
    val server = RpcStubServer.start(dir, maxBlock)
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/")
    finally server.stop(0)
  }

  test("forChain dispatches on URI scheme") {
    assert(EthClient.forChain("http://example.invalid/").isInstanceOf[JsonRpcChainClient])
    assert(EthClient.forChain("ipc:///var/run/geth.ipc").isInstanceOf[JsonRpcChainClient])
    assert(EthClient.forChain(dir).isInstanceOf[FixtureChainClient])
  }

  test("scan over unix IPC is byte-identical to the fixture backend") {
    val sockDir = java.nio.file.Files.createTempDirectory("ipc")
    val sock = sockDir.resolve("geth.ipc").toString
    val server = RpcStubServer.startIpc(dir, 32, sock)
    try {
      val ipc = EthClient.forChain(s"ipc://$sock")
      val fx = EthClient.forChain(dir)
      // full scan incl. transactions + receipt logs over the socket
      val a = ipc.blocks(1, 32, fullTx = true).toVector
      val b = fx.blocks(1, 32, fullTx = true).toVector
      assert(a.size == b.size && a.nonEmpty)
      assert(a == b)
      // point lookups + account RPCs through the same framing (the stub
      // advertises the tip it can actually serve, not the fixture's)
      assert(ipc.blockNumber() == 32L)
      assert(ipc.timestampOf(7L) == fx.timestampOf(7L))
      val h = fx.blocks(3, 3, fullTx = false).next().hash
      assert(ipc.blockNumberByHash(h).contains(3L))
      val addr = fx.blocks(2, 2).next().transactions.head.from
      assert(ipc.getBalance(addr, None) == fx.getBalance(addr, None))
      // DSv2 read through ipc:// equals the fixture-backed read
      import spark.implicits._
      val viaIpc = spark.read.format("ethereum")
        .option("table", "block").option("chain", s"ipc://$sock").load()
        .filter($"block_number" <= 20)
        .select($"block_number", $"block_hash", $"block_miner")
        .orderBy($"block_number").collect()
      val viaFx = spark.read.format("ethereum")
        .option("table", "block").option("chain", dir).load()
        .filter($"block_number" <= 20)
        .select($"block_number", $"block_hash", $"block_miner")
        .orderBy($"block_number").collect()
      assert(viaIpc.sameElements(viaFx) && viaIpc.length == 20)
    } finally {
      server.close()
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(sock))
    }
  }

  test("a stalled IPC endpoint times out with IOException instead of wedging") {
    val sockDir = java.nio.file.Files.createTempDirectory("ipc-stall")
    val sock = sockDir.resolve("stall.ipc").toString
    // accepts connections and reads requests, but never answers
    val ssc = java.nio.channels.ServerSocketChannel.open(java.net.StandardProtocolFamily.UNIX)
    ssc.bind(java.net.UnixDomainSocketAddress.of(sock))
    val t = new Thread(() => {
      try {
        while (true) {
          val ch = ssc.accept()
          val buf = java.nio.ByteBuffer.allocate(4096)
          while (ch.read(buf) >= 0) buf.clear() // drain forever, reply never
        }
      } catch { case _: java.nio.channels.ClosedChannelException => () }
    })
    t.setDaemon(true); t.start()
    try {
      val transport = new graft.sources.eth.IpcTransport(sock, readTimeoutMs = 400)
      val t0 = System.nanoTime()
      val e = intercept[java.io.IOException](
        transport.exchange("""{"jsonrpc":"2.0","id":1,"method":"eth_blockNumber","params":[]}"""
          .getBytes("UTF-8")))
      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      assert(e.getMessage.contains("timed out"), e.getMessage)
      // bounded: IOException means the client's transport retry loop applies
      assert(elapsedMs < 5000, s"took ${elapsedMs}ms")
      // connecting to a socket nobody listens on also fails as IOException
      val dead = sockDir.resolve("nobody.ipc").toString
      intercept[java.io.IOException](
        new graft.sources.eth.IpcTransport(dead, connectTimeoutMs = 400)
          .exchange("{}".getBytes("UTF-8")))
    } finally {
      ssc.close()
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(sock))
    }
  }

  test("block scan over JSON-RPC equals the fixture scan (full tx + logs)") {
    withServer(48) { url =>
      val rpc = EthClient.forChain(url)
      val fx = EthClient.forChain(dir)
      val a = rpc.blocks(1, 48, fullTx = true).toVector
      val b = fx.blocks(1, 48, fullTx = true).toVector
      assert(a.size == b.size && a.nonEmpty)
      assert(a == b)
      // pruned variant skips transactions
      val pruned = rpc.blocks(5, 9, fullTx = false).toVector
      assert(pruned.map(_.number) == (5L to 9L).toVector)
      assert(pruned.forall(_.transactions.isEmpty))
    }
  }

  test("point lookups and account RPCs match the fixture backend") {
    withServer(16) { url =>
      val rpc = EthClient.forChain(url)
      val fx = EthClient.forChain(dir)
      assert(rpc.blockNumber() == 16L) // stub tip = blocks it can serve
      assert(rpc.gasPrice() == fx.gasPrice())
      assert(rpc.timestampOf(7L) == fx.timestampOf(7L))
      val h = fx.blocks(3, 3, fullTx = false).next().hash
      assert(rpc.blockNumberByHash(h).contains(3L))
      assert(rpc.blockNumberByHash("0x" + "0" * 64).isEmpty)
      val addr = fx.blocks(2, 2).next().transactions.head.from
      assert(rpc.getBalance(addr, None) == fx.getBalance(addr, None))
      assert(rpc.getBalance(addr, Some(4L)) == fx.getBalance(addr, Some(4L)))
      assert(rpc.getTransactionCount(addr, None) == fx.getTransactionCount(addr, None))
      assert(rpc.getCode(addr) == fx.getCode(addr))
    }
  }

  test("micro-batch streaming follows the chain through the live RPC client") {
    import org.apache.spark.sql.streaming.Trigger
    withServer(32) { url =>
      val q = spark.readStream.format("ethereum")
        .option("table", "block").option("chain", url)
        .option("maxBlocksPerBatch", 16)
        .load()
        .select("block_number", "block_miner")
        .writeStream.format("memory").queryName("rpc_stream")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      // the stub serves and advertises blocks 1..32; the stream must
      // deliver exactly those (rate-limited to 16 per micro-batch)
      val got = spark.table("rpc_stream").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == (1L to 32L), s"got ${got.length} blocks")
      q.stop()
    }
  }

  test("transient HTTP failures retry; protocol errors do not") {
    import com.sun.net.httpserver.HttpServer
    import java.net.InetSocketAddress
    val failures = new java.util.concurrent.atomic.AtomicInteger(2)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      try {
        val body = new String(ex.getRequestBody.readAllBytes())
        if (failures.getAndDecrement() > 0) {
          ex.sendResponseHeaders(503, -1) // transient -> client must retry
        } else {
          val resp =
            if (body.contains("eth_gasPrice"))
              """{"jsonrpc":"2.0","id":1,"result":"0x4e3b29200"}"""
            else """{"jsonrpc":"2.0","id":1,"error":{"code":-32601,"message":"nope"}}"""
          val bytes = resp.getBytes("UTF-8")
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
        }
      } finally ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/"
      val client = new JsonRpcChainClient(url, retryBackoffMs = 10)
      // two 503s then success: retries absorb them
      assert(client.gasPrice() == 21e9)
      // protocol error: fails fast, no retry loop
      failures.set(0)
      intercept[IllegalStateException](client.blockNumber())
    } finally server.stop(0)
  }

  test("post-merge response shapes parse: no totalDifficulty, type-2 gasPrice") {
    val mapper = new ObjectMapper()
    // post-merge Geth (>=1.14) block: totalDifficulty absent, difficulty 0x0;
    // type-2 tx: gasPrice absent, maxFeePerGas present
    val block = mapper.readTree(
      """{"number":"0x10","hash":"0xb","parentHash":"0xp","nonce":"0x0000000000000000",
          "sha3Uncles":"0xs","logsBloom":"0xl","transactionsRoot":"0xt","stateRoot":"0xr",
          "miner":"0xm","difficulty":"0x0","size":"0x220","extraData":"0x",
          "gasLimit":"0x1c9c380","gasUsed":"0x5208","timestamp":"0x64000000","uncles":[],
          "transactions":[
            {"hash":"0xt1","nonce":"0x1","from":"0xf","to":"0xa","value":"0xde0b6b3a7640000",
             "gas":"0x5208","maxFeePerGas":"0x77359400","maxPriorityFeePerGas":"0x3b9aca00",
             "input":"0x","type":"0x2"},
            {"hash":"0xt2","nonce":"0x2","from":"0xf","to":null,"value":"0x0",
             "gas":"0x5208","input":"0x","type":"0x2"}]}""".replaceAll("\n\\s*", ""))
    val b = JsonRpcChainClient.parseRpcBlock(block, Map.empty, fullTx = true)
    assert(b.totalDifficulty == 0L && b.difficulty == 0L)
    // pre-London shape (no baseFeePerGas): the cap is the only published
    // quantity -> used as-is
    assert(b.transactions(0).gasPrice == 2e9)
    assert(b.transactions(1).gasPrice == 0.0) // neither field -> 0
    assert(b.transactions(1).to.isEmpty)
  }

  test("type-2 gasPrice reconstructs the effective price, not the fee cap") {
    val mapper = new ObjectMapper()
    // post-London block: baseFee 1 gwei; tx1 tips 0.5 gwei under a 2 gwei
    // cap -> effective = base+tip = 1.5 gwei; tx2 tips 3 gwei under the
    // same cap -> capped at 2 gwei; tx3 omits the tip -> base alone
    val block = mapper.readTree(
      """{"number":"0x10","hash":"0xb","parentHash":"0xp","nonce":"0x0000000000000000",
          "sha3Uncles":"0xs","logsBloom":"0xl","transactionsRoot":"0xt","stateRoot":"0xr",
          "miner":"0xm","difficulty":"0x0","size":"0x220","extraData":"0x",
          "baseFeePerGas":"0x3b9aca00",
          "gasLimit":"0x1c9c380","gasUsed":"0x5208","timestamp":"0x64000000","uncles":[],
          "transactions":[
            {"hash":"0xt1","nonce":"0x1","from":"0xf","to":"0xa","value":"0x0",
             "gas":"0x5208","maxFeePerGas":"0x77359400","maxPriorityFeePerGas":"0x1dcd6500",
             "input":"0x","type":"0x2"},
            {"hash":"0xt2","nonce":"0x2","from":"0xf","to":"0xa","value":"0x0",
             "gas":"0x5208","maxFeePerGas":"0x77359400","maxPriorityFeePerGas":"0xb2d05e00",
             "input":"0x","type":"0x2"},
            {"hash":"0xt3","nonce":"0x3","from":"0xf","to":"0xa","value":"0x0",
             "gas":"0x5208","maxFeePerGas":"0x77359400",
             "input":"0x","type":"0x2"},
            {"hash":"0xt4","nonce":"0x4","from":"0xf","to":"0xa","value":"0x0",
             "gas":"0x5208","gasPrice":"0x2540be400",
             "input":"0x","type":"0x0"}]}""".replaceAll("\n\\s*", ""))
    val b = JsonRpcChainClient.parseRpcBlock(block, Map.empty, fullTx = true)
    assert(b.transactions(0).gasPrice == 1.5e9) // base + tip below cap
    assert(b.transactions(1).gasPrice == 2e9)   // capped at maxFeePerGas
    assert(b.transactions(2).gasPrice == 1e9)   // missing tip -> base fee
    assert(b.transactions(3).gasPrice == 10e9)  // explicit gasPrice wins
  }

  test("batch responses with unmatchable ids fail descriptively, dropped slots retry then fail") {
    import com.sun.net.httpserver.HttpServer
    import java.net.InetSocketAddress
    val mode = new java.util.concurrent.atomic.AtomicReference("null_id")
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      try {
        val reqBody = ex.getRequestBody.readAllBytes()
        val resp = mode.get() match {
          // spec-allowed error response for an unparseable request
          case "null_id" =>
            """[{"jsonrpc":"2.0","id":null,"error":{"code":-32700,"message":"parse error"}}]"""
          case "out_of_range" =>
            """[{"jsonrpc":"2.0","id":99,"result":null}]"""
          // server persistently drops request id 0, answers everything else
          // (so the client's re-request of the dropped slot stays dropped)
          case "partial" =>
            val req = new ObjectMapper().readTree(reqBody)
            val kept = scala.collection.mutable.ArrayBuffer.empty[String]
            req.forEach { r =>
              val id = r.get("id").asInt()
              if (id != 0) kept += s"""{"jsonrpc":"2.0","id":$id,"result":null}"""
            }
            kept.mkString("[", ",", "]")
          // both requests answered, but with null results for in-range blocks
          case "null_blocks" =>
            """[{"jsonrpc":"2.0","id":0,"result":null},
                {"jsonrpc":"2.0","id":1,"result":null}]""".replaceAll("\n\\s*", "")
        }
        val bytes = resp.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
      } finally ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/"
      val client = new JsonRpcChainClient(url, retryBackoffMs = 1)
      val eNull = intercept[IllegalStateException](client.blocks(1, 2).toVector)
      assert(eNull.getMessage.contains("unmatchable id"), eNull.getMessage)
      mode.set("out_of_range")
      val eRange = intercept[IllegalStateException](client.blocks(1, 2).toVector)
      assert(eRange.getMessage.contains("unmatchable id"), eRange.getMessage)
      mode.set("partial")
      // a slot the server keeps dropping is re-requested, then fails loudly
      // (silently missing rows were the round-3 ADVICE finding)
      val eDrop = intercept[java.io.IOException](client.blocks(1, 2).toVector)
      assert(eDrop.getMessage.contains("unanswered"), eDrop.getMessage)
      assert(eDrop.getMessage.contains("eth_getBlockByNumber"), eDrop.getMessage)
      mode.set("null_blocks")
      // answered nulls for tip-bounded blocks are data loss, not "no block"
      val eNullBlk = intercept[IllegalStateException](client.blocks(1, 2).toVector)
      assert(eNullBlk.getMessage.contains("in-range block"), eNullBlk.getMessage)
    } finally server.stop(0)
  }

  test("transaction scans skip receipt fetches; erc20 scans still batch them") {
    val counts = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    val server = RpcStubServer.start(dir, 8, counts)
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/"
      val rpc = EthClient.forChain(url)
      // client level: fullTx without logs fetches no receipts
      assert(rpc.blocks(1, 8, fullTx = true, needLogs = false).flatMap(_.transactions).nonEmpty)
      assert(!counts.containsKey("eth_getTransactionReceipt"), counts.toString)
      // DSv2 level: a transaction-table scan stays receipt-free
      val txRows = spark.read.format("ethereum")
        .option("table", "transaction").option("chain", url).load()
        .filter(org.apache.spark.sql.functions.col("tx_blockNumber") <= 8)
        .count()
      assert(txRows > 0 && !counts.containsKey("eth_getTransactionReceipt"), counts.toString)
      // erc20 decode needs the logs -> receipts are fetched (batched)
      spark.read.format("ethereum")
        .option("table", "erc20").option("chain", url).load()
        .filter(org.apache.spark.sql.functions.col("erc20_blockNumber") <= 8)
        .collect()
      assert(counts.getOrDefault("eth_getTransactionReceipt", 0L) > 0L, counts.toString)
    } finally server.stop(0)
  }

  test("batched account table equals the scalar RPCs with one exchange per batch") {
    import org.apache.spark.sql.functions.col
    val counts = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    val server = RpcStubServer.start(dir, 60, counts)
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/"
      // addresses come from the LOCAL fixture scan (no HTTP), one
      // partition so the exchange count is exactly ceil(N / batchSize)
      val addrs = spark.read.format("ethereum")
        .option("table", "transaction").option("chain", dir).load()
        .filter(col("tx_blockNumber") <= 50 && col("tx_from").isNotNull)
        .select(col("tx_from").as("addr")).distinct()
        .repartition(1)
      val n = addrs.count()
      assert(n > 16, s"need more than one batch, got $n addresses")
      counts.clear()
      val got = graft.functions.Web3Functions
        .accountStates(addrs, url, None, batchSize = 16)
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
      val exchanges = counts.getOrDefault("__http_exchanges__", 0L)
      val expectedBatches = (n + 15) / 16
      assert(exchanges == expectedBatches,
        s"expected $expectedBatches batched exchanges for $n addresses, got $exchanges")
      assert(counts.getOrDefault("eth_getBalance", 0L) == n &&
             counts.getOrDefault("eth_getTransactionCount", 0L) == n,
        s"each address must be asked exactly once per method: $counts")
      // value-identical to the scalar per-address RPC path
      val scalar = graft.sources.eth.EthClient.forChain(url)
      got.foreach { case (a, (bal, nonce)) =>
        assert(bal == scalar.getBalance(a, None) &&
               nonce == scalar.getTransactionCount(a, None),
          s"batched state for $a diverges from the scalar RPCs")
      }
      assert(got.size.toLong == n)
    } finally server.stop(0)
  }

  test("DSv2 ethereum source reads through the live client") {
    withServer(32) { url =>
      import spark.implicits._
      val viaRpc = spark.read.format("ethereum")
        .option("table", "block").option("chain", url).load()
        .filter($"block_number" <= 20)
        .select($"block_number", $"block_hash", $"block_timestamp", $"block_miner")
        .orderBy($"block_number").collect()
      val viaFixture = spark.read.format("ethereum")
        .option("table", "block").option("chain", dir).load()
        .filter($"block_number" <= 20)
        .select($"block_number", $"block_hash", $"block_timestamp", $"block_miner")
        .orderBy($"block_number").collect()
      assert(viaRpc.sameElements(viaFixture) && viaRpc.length == 20)
    }
  }
}
