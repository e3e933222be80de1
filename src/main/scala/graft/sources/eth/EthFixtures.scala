package graft.sources.eth

import java.io.{BufferedWriter, FileWriter}
import java.math.BigInteger
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Random

import scala.collection.mutable

import org.apache.spark.sql.{Row, SparkSession}

/** Deterministic Ethereum-shaped fixture chain (FIXTURES.md §1).
  *
  * Writes two artifacts under a fixture dir:
  *  1. the *input*: a JSONL chain ([[FixtureChainClient]] layout) — what the
  *     engine under test reads through the DSv2 source;
  *  2. the *oracle*: expected `block`/`transaction`/`erc20` parquet tables
  *     derived straight from the generation parameters (NOT by running the
  *     decoder), so the differential check engine-vs-DuckDB is meaningful.
  *
  * Everything is seeded per block, so regeneration is byte-stable. Log kinds
  * cover the reference's decode branches (`EthereumRecordCursor.java:151-189`):
  * fully-indexed transfers, 1- and 2-topic unindexed variants, a malformed
  * unindexed arity (dropped), ERC-721-style empty-data transfers (value 0.0),
  * and non-Transfer events (dropped).
  */
object EthFixtures {
  val DefaultDir = "/root/repo/fixtures/eth"
  val Blocks = 6000L
  val GenesisTs = 1438269988L

  lazy val addrPool: Vector[String] =
    (0 until 200).map(i => "0x" + EthClient.sha256Hex(s"addr-$i").take(40)).toVector
  lazy val minerPool: Vector[String] =
    (0 until 24).map(i => "0x" + EthClient.sha256Hex(s"miner-$i").take(40)).toVector
  /** 12 well-known token contracts (resolve to symbols) + 6 unknown ones
    * (resolve to `ERC20(addr)`). */
  lazy val tokenContracts: Vector[String] = {
    val known = Vector("BAT", "Golem", "EOS", "OmiseGo", "MKR", "Civic", "Storj",
      "Gnosis", "district0x", "QTUM", "Bancor", "StatusNetwork")
      .map(Erc20Decoder.tokenBySymbolAddr)
    val unknown = (0 until 6).map(i => "0x" + EthClient.sha256Hex(s"token-$i").take(40))
    known ++ unknown
  }

  def blockHash(n: Long): String = "0x" + EthClient.sha256Hex(s"blk-$n")
  def txHash(n: Long, j: Int): String = "0x" + EthClient.sha256Hex(s"tx-$n-$j")

  private def word(hex40: String): String = "0x" + "0" * 24 + hex40.drop(2)
  private def valueWord(v: BigInteger): String = {
    val h = v.toString(16)
    "0x" + "0" * (64 - h.length) + h
  }

  /** Blocks above this height carry occasional uint256 transfer values
    * far beyond 2^64 — the regime where the reference's double narrowing
    * (`EthereumERC20Utils.java:8-14`) actually loses precision and the
    * `weiDecimal` DECIMAL(38,0) mode earns its keep. Kept OUT of the
    * double-summed oracle ranges (eth_q4/eth_q11 filter blocks
    * 2000–4000) so float-order-sensitive sums stay integer-exact. */
  val HugeValueFloor = 5000L

  /** One block, seeded by its number. Returns the block plus the expected
    * decoded transfers implied by the chosen log parameters. */
  def genBlock(n: Long, prevTotalDifficulty: Long, ts: Long)
      : (EthBlockData, Vector[Erc20Decoder.Erc20Transfer]) = {
    val rng = new Random(42L * 1000003L + n)
    val expected = Vector.newBuilder[Erc20Decoder.Erc20Transfer]
    val nTx = rng.nextInt(6)
    val txs = (0 until nTx).map { j =>
      val hash = txHash(n, j)
      val from = addrPool(rng.nextInt(addrPool.size))
      val to = if (rng.nextInt(50) == 0) None else Some(addrPool(rng.nextInt(addrPool.size)))
      val nLogs = if (rng.nextInt(100) < 55) 1 + rng.nextInt(2) else 0
      val logs = (0 until nLogs).map { _ =>
        val contract = tokenContracts(rng.nextInt(tokenContracts.size))
        val lFrom = addrPool(rng.nextInt(addrPool.size))
        val lTo = addrPool(rng.nextInt(addrPool.size))
        val small = 1L + (rng.nextLong() & Long.MaxValue) % 1000000000L
        // ~1 in 5 logs in the huge-value region carry a 94-bit+ uint256:
        // (small << 70) | low — unrepresentable in a double's 53-bit mantissa
        val v: BigInteger =
          if (n > HugeValueFloor && rng.nextInt(5) == 0)
            BigInteger.valueOf(small).shiftLeft(70)
              .add(BigInteger.valueOf(1L + (rng.nextLong() & Long.MaxValue) % 1000000000L))
          else BigInteger.valueOf(small)
        val kind = rng.nextInt(100)
        def emit(exact: BigInteger): Unit =
          expected += Erc20Decoder.Erc20Transfer(
            Erc20Decoder.tokenName(contract), lFrom, lTo, exact.doubleValue,
            hash, n, valueExact = exact)
        kind match {
          case k if k < 50 => // indexed 3-topic transfer
            emit(v)
            EthLog(contract, Vector(Erc20Decoder.TransferTopic, word(lFrom), word(lTo)),
              valueWord(v), hash, n)
          case k if k < 60 => // unindexed: sig only, from/to/value in data
            emit(v)
            EthLog(contract, Vector(Erc20Decoder.TransferTopic),
              "0x" + word(lFrom).drop(2) + word(lTo).drop(2) + valueWord(v).drop(2), hash, n)
          case k if k < 70 => // partially indexed: sig+from, to/value in data
            emit(v)
            EthLog(contract, Vector(Erc20Decoder.TransferTopic, word(lFrom)),
              "0x" + word(lTo).drop(2) + valueWord(v).drop(2), hash, n)
          case k if k < 75 => // malformed unindexed arity -> dropped
            EthLog(contract, Vector(Erc20Decoder.TransferTopic),
              "0x" + word(lFrom).drop(2) + word(lTo).drop(2), hash, n)
          case k if k < 82 => // ERC-721-style: 4 indexed topics, empty data -> value 0.0
            emit(BigInteger.ZERO)
            EthLog(contract, Vector(Erc20Decoder.TransferTopic, word(lFrom), word(lTo),
              valueWord(v)), "0x", hash, n)
          case _ => // non-Transfer event -> dropped
            EthLog(contract, Vector("0x" + EthClient.sha256Hex("Approval(address,address,uint256)")),
              valueWord(v), hash, n)
        }
      }.toVector
      EthTx(
        hash = hash, nonce = rng.nextInt(1000).toLong, blockHash = blockHash(n),
        blockNumber = n, transactionIndex = j, from = from, to = to,
        value = math.floor(rng.nextDouble() * 1.0e18),
        gas = (21000 + rng.nextInt(500000)).toDouble,
        gasPrice = (1 + rng.nextInt(100)).toDouble * 1.0e9,
        input = if (rng.nextInt(3) == 0) "0xa9059cbb" + EthClient.sha256Hex(s"in-$n-$j") else "0x",
        logs = logs)
    }.toVector
    val difficulty = 2000000000000L + n * 1000000L + rng.nextInt(1000000)
    val gasUsed = math.min(8.0e6, txs.map(_.gas).sum)
    val nUncles = if (rng.nextInt(14) == 0) 1 + rng.nextInt(2) else 0
    val block = EthBlockData(
      number = n, hash = blockHash(n), parentHash = blockHash(n - 1),
      nonce = "0x" + EthClient.sha256Hex(s"nonce-$n").take(16),
      sha3Uncles = "0x" + EthClient.sha256Hex(s"su-$n"),
      logsBloom = "0x" + EthClient.sha256Hex(s"lb-$n") * 8,
      transactionsRoot = "0x" + EthClient.sha256Hex(s"tr-$n"),
      stateRoot = "0x" + EthClient.sha256Hex(s"sr-$n"),
      miner = { val r = rng.nextDouble(); minerPool((r * r * minerPool.size).toInt) },
      difficulty = difficulty, totalDifficulty = prevTotalDifficulty + difficulty,
      size = 500 + rng.nextInt(49500),
      extraData = s"graft fixture $n",
      gasLimit = 8.0e6, gasUsed = gasUsed, timestamp = ts,
      uncles = (0 until nUncles).map(u => "0x" + EthClient.sha256Hex(s"uncle-$n-$u")).toVector,
      transactions = txs)
    (block, expected.result())
  }

  private def jsonStr(s: String): String = "\"" + s + "\"" // fixture strings are plain ASCII

  private def blockJson(b: EthBlockData): String = {
    val sb = new StringBuilder(4096)
    sb.append("{\"number\":").append(b.number)
      .append(",\"hash\":").append(jsonStr(b.hash))
      .append(",\"parentHash\":").append(jsonStr(b.parentHash))
      .append(",\"nonce\":").append(jsonStr(b.nonce))
      .append(",\"sha3Uncles\":").append(jsonStr(b.sha3Uncles))
      .append(",\"logsBloom\":").append(jsonStr(b.logsBloom))
      .append(",\"transactionsRoot\":").append(jsonStr(b.transactionsRoot))
      .append(",\"stateRoot\":").append(jsonStr(b.stateRoot))
      .append(",\"miner\":").append(jsonStr(b.miner))
      .append(",\"difficulty\":").append(b.difficulty)
      .append(",\"totalDifficulty\":").append(b.totalDifficulty)
      .append(",\"size\":").append(b.size)
      .append(",\"extraData\":").append(jsonStr(b.extraData))
      .append(",\"gasLimit\":").append(b.gasLimit)
      .append(",\"gasUsed\":").append(b.gasUsed)
      .append(",\"timestamp\":").append(b.timestamp)
      .append(",\"uncles\":[").append(b.uncles.map(jsonStr).mkString(","))
      .append("],\"transactions\":[")
    var first = true
    b.transactions.foreach { t =>
      if (!first) sb.append(','); first = false
      sb.append("{\"hash\":").append(jsonStr(t.hash))
        .append(",\"nonce\":").append(t.nonce)
        .append(",\"from\":").append(jsonStr(t.from))
        .append(",\"to\":").append(t.to.map(jsonStr).getOrElse("null"))
        .append(",\"value\":").append(t.value)
        .append(",\"gas\":").append(t.gas)
        .append(",\"gasPrice\":").append(t.gasPrice)
        .append(",\"input\":").append(jsonStr(t.input))
        .append(",\"logs\":[")
      var lf = true
      t.logs.foreach { l =>
        if (!lf) sb.append(','); lf = false
        sb.append("{\"address\":").append(jsonStr(l.address))
          .append(",\"topics\":[").append(l.topics.map(jsonStr).mkString(","))
          .append("],\"data\":").append(jsonStr(l.data)).append('}')
      }
      sb.append("]}")
    }
    sb.append("]}")
    sb.toString()
  }

  /** Write an arbitrary (single-chunk) chain in the fixture layout —
    * lets tests rewrite a chain underneath a running stream (reorg
    * simulation). Overwrites chain file, hash index, and tip marker. */
  def writeRawChain(dir: String, blocks: Seq[EthBlockData], tip: Long): Unit = {
    require(blocks.nonEmpty && blocks.size <= FixtureChainClient.BlocksPerFile,
      s"writeRawChain supports one chunk file, got ${blocks.size} blocks")
    Files.createDirectories(Paths.get(dir, "chain"))
    // chunk swapped in atomically and the tip marker written LAST: a
    // concurrent micro-batch either sees the old chain, or the new blocks
    // under the old (lower) tip — never a torn file or a tip pointing at
    // blocks that are not there yet
    val tmp = Paths.get(dir, "chain", ".blocks-0000001.jsonl.tmp")
    val w = new BufferedWriter(new FileWriter(tmp.toFile))
    try blocks.foreach { b => w.write(blockJson(b)); w.newLine() } finally w.close()
    Files.move(tmp, Paths.get(dir, "chain", "blocks-0000001.jsonl"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val hi = new BufferedWriter(new FileWriter(s"$dir/hash-index.txt"))
    try blocks.foreach { b => hi.write(s"${b.hash} ${b.number}"); hi.newLine() } finally hi.close()
    Files.write(Paths.get(dir, "meta.txt"),
      s"tip=$tip\n".getBytes(StandardCharsets.UTF_8))
  }

  /** Generate ONLY the JSONL chain (no expected-parquet oracle tables) —
    * for scan/pushdown measurements at chain lengths where driver-side
    * oracle accumulation is pointless weight ([[graft.tools.PushdownPayoff]]
    * uses ~100k blocks). Same per-block seeding as [[ensure]], so block
    * `n` here is byte-identical to block `n` of the standard fixture.
    * Marker-guarded and synchronized like [[ensure]]. */
  def ensureChainOnly(dir: String, nBlocks: Long): String = synchronized {
    val marker = Paths.get(dir, "_SUCCESS_CHAIN")
    if (Files.exists(marker)) return dir
    val t0 = System.nanoTime()
    Files.createDirectories(Paths.get(dir, "chain"))
    val hashIndex = new BufferedWriter(new FileWriter(s"$dir/hash-index.txt"))
    var chainWriter: BufferedWriter = null
    var totalDifficulty = 0L
    var ts = GenesisTs
    var n = 1L
    while (n <= nBlocks) {
      if ((n - 1) % FixtureChainClient.BlocksPerFile == 0) {
        if (chainWriter != null) chainWriter.close()
        chainWriter = new BufferedWriter(
          new FileWriter(f"$dir/chain/blocks-$n%07d.jsonl"))
      }
      val rng = new Random(977L * n)
      ts += 9 + rng.nextInt(9)
      val (b, _) = genBlock(n, totalDifficulty, ts)
      totalDifficulty = b.totalDifficulty
      chainWriter.write(blockJson(b)); chainWriter.newLine()
      hashIndex.write(s"${b.hash} ${b.number}"); hashIndex.newLine()
      n += 1
    }
    chainWriter.close()
    hashIndex.close()
    Files.write(Paths.get(dir, "meta.txt"),
      s"tip=$nBlocks\n".getBytes(StandardCharsets.UTF_8))
    Files.write(marker, Array.emptyByteArray)
    System.err.println(f"[eth-fixtures] generated chain-only $nBlocks blocks " +
      f"in ${(System.nanoTime() - t0) / 1e9}%.1fs -> $dir")
    dir
  }

  /** Generate chain + oracle tables under `dir` unless already present.
    * Safe to call from every query — synchronized and marker-guarded. */
  def ensure(spark: SparkSession, dir: String = DefaultDir): String = synchronized {
    val marker = Paths.get(dir, "_SUCCESS")
    if (Files.exists(marker)) return dir
    val t0 = System.nanoTime()
    Files.createDirectories(Paths.get(dir, "chain"))

    val blockRows = mutable.ArrayBuffer.empty[Row]
    val txRows = mutable.ArrayBuffer.empty[Row]
    val ercRows = mutable.ArrayBuffer.empty[Row]
    val ercExactRows = mutable.ArrayBuffer.empty[Row]
    val hashIndex = new BufferedWriter(new FileWriter(s"$dir/hash-index.txt"))
    var chainWriter: BufferedWriter = null
    var totalDifficulty = 0L
    var ts = GenesisTs
    var n = 1L
    while (n <= Blocks) {
      if ((n - 1) % FixtureChainClient.BlocksPerFile == 0) {
        if (chainWriter != null) chainWriter.close()
        chainWriter = new BufferedWriter(
          new FileWriter(f"$dir/chain/blocks-$n%07d.jsonl"))
      }
      val rng = new Random(977L * n)
      ts += 9 + rng.nextInt(9) // ~13s +- 4s spacing
      val (b, transfers) = genBlock(n, totalDifficulty, ts)
      totalDifficulty = b.totalDifficulty
      chainWriter.write(blockJson(b)); chainWriter.newLine()
      hashIndex.write(s"${b.hash} ${b.number}"); hashIndex.newLine()

      blockRows += Row(b.number, b.hash, b.parentHash, b.nonce, b.sha3Uncles,
        b.logsBloom, b.transactionsRoot, b.stateRoot, b.miner, b.difficulty,
        b.totalDifficulty, b.size, b.extraData, b.gasLimit, b.gasUsed,
        b.timestamp, b.transactions.map(_.hash), b.uncles)
      b.transactions.foreach { t =>
        txRows += Row(t.hash, t.nonce, t.blockHash, t.blockNumber,
          t.transactionIndex, t.from, t.to.orNull, t.value, t.gas, t.gasPrice, t.input)
      }
      transfers.foreach { e =>
        ercRows += Row(e.token, e.from, e.to, e.value, e.txHash, e.blockNumber)
        ercExactRows += Row(e.token, e.from, e.to, e.valueExact.toString,
          e.txHash, e.blockNumber)
      }
      n += 1
    }
    chainWriter.close()
    hashIndex.close()
    Files.write(Paths.get(dir, "meta.txt"),
      s"tip=$Blocks\n".getBytes(StandardCharsets.UTF_8))

    import scala.jdk.CollectionConverters._
    def write(rows: mutable.ArrayBuffer[Row], schema: org.apache.spark.sql.types.StructType,
              name: String): Unit =
      spark.createDataFrame(rows.asJava, schema)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/expected/$name")
    write(blockRows, EthSchemas.blockSchema, "block")
    write(txRows, EthSchemas.transactionSchema, "transaction")
    write(ercRows, EthSchemas.erc20Schema, "erc20")
    // exact uint256 values as decimal-digit strings (doubles cannot carry
    // them above 2^53) — the weiDecimal mode's differential oracle input
    val exactSchema = org.apache.spark.sql.types.StructType(
      EthSchemas.erc20Schema.map { f =>
        if (f.name == "erc20_value")
          org.apache.spark.sql.types.StructField(
            f.name, org.apache.spark.sql.types.StringType)
        else f
      })
    write(ercExactRows, exactSchema, "erc20_exact")

    Files.write(marker, Array.emptyByteArray)
    System.err.println(f"[eth-fixtures] generated $Blocks blocks, ${txRows.size} txs, " +
      f"${ercRows.size} transfers in ${(System.nanoTime() - t0) / 1e9}%.1fs -> $dir")
    dir
  }
}
