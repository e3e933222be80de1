package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.eth.EthFixtures
import graft.streaming.EventStreams

/** Streaming surface: tip-following ethereum micro-batch source + event
  * windowing/sessionization, each checked against its batch equivalent. */
class EthStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Minimal block for chain-rewrite tests; `ver` versions the hash so a
    * reorged height is distinguishable from the branch it replaced. */
  private def mkBlock(n: Long, ver: String): graft.sources.eth.EthBlockData =
    graft.sources.eth.EthBlockData(
      number = n, hash = s"0x$ver-$n", parentHash = s"0x$ver-${n - 1}",
      nonce = "0x0", sha3Uncles = "0x0", logsBloom = "0x0",
      transactionsRoot = "0x0", stateRoot = "0x0", miner = "0xminer",
      difficulty = 1L, totalDifficulty = n, size = 500,
      extraData = s"$ver$n", gasLimit = 8.0e6, gasUsed = 0.0,
      timestamp = 1438269988L + n * 13, uncles = Vector.empty,
      transactions = Vector.empty)

  test("lag-bounded stream never emits orphaned blocks across a reorg") {
    val dir = java.nio.file.Files.createTempDirectory("reorgchain").toString
    // branch A: heights 1..30; with lagBlocks=5 only 1..25 are visible
    EthFixtures.writeRawChain(dir, (1L to 30L).map(mkBlock(_, "a")), tip = 30)
    val q = spark.readStream.format("ethereum")
      .option("table", "block").option("chain", dir)
      .option("maxBlocksPerBatch", 10).option("lagBlocks", 5)
      .load()
      .select("block_number", "block_hash")
      .writeStream.format("memory").queryName("reorg_stream")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      q.processAllAvailable()
      val phase1 = spark.table("reorg_stream").collect()
        .map(r => r.getLong(0) -> r.getString(1))
      assert(phase1.map(_._1).sorted.toSeq == (1L to 25L),
        s"phase 1 emitted ${phase1.length} blocks")
      // reorg of depth 5 — within the lag window: heights 26..30 are
      // replaced by branch B, chain extends to 36 (visible tip 31)
      EthFixtures.writeRawChain(dir,
        (1L to 25L).map(mkBlock(_, "a")) ++ (26L to 36L).map(mkBlock(_, "b")),
        tip = 36)
      q.processAllAvailable()
      val rows = spark.table("reorg_stream").collect()
        .map(r => r.getLong(0) -> r.getString(1))
      // exactly one row per height — no height was emitted twice
      assert(rows.map(_._1).sorted.toSeq == (1L to 31L),
        s"got heights ${rows.map(_._1).sorted.mkString(",")}")
      val byHeight = rows.toMap
      // nothing from orphaned branch-A 26..30 ever reached the sink; the
      // lag bound held the un-final region back until branch B won
      (1L to 25L).foreach(n => assert(byHeight(n) == s"0xa-$n"))
      (26L to 31L).foreach(n => assert(byHeight(n) == s"0xb-$n",
        s"height $n emitted orphaned block ${byHeight(n)}"))
    } finally q.stop()
  }

  test("ethereum micro-batch stream delivers the whole chain in rate-limited batches") {
    val dir = EthFixtures.ensure(spark)
    val stream = spark.readStream.format("ethereum")
      .option("table", "block").option("chain", dir)
      .option("maxBlocksPerBatch", 2048)
      .load()
      .select("block_number", "block_miner")
    val q = stream.writeStream.format("memory").queryName("eth_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("eth_stream")
    assert(got.count() == EthFixtures.Blocks)
    assert(got.select("block_number").distinct().count() == EthFixtures.Blocks)
    // rate limit respected: ceil(6000/2048) = 3 non-empty batches
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 3, s"expected >=3 rate-limited batches, got ${batches.length}")
    assert(batches.forall(_.numInputRows <= 2048 * 1.0))
    q.stop()
  }

  test("checkpoint restart resumes from the committed offset, exactly once") {
    val dir = EthFixtures.ensure(spark)
    val ckpt = java.nio.file.Files.createTempDirectory("ethckpt").toString
    val out = java.nio.file.Files.createTempDirectory("ethout").toString
    def run(lag: Long): Unit = {
      val q = spark.readStream.format("ethereum")
        .option("table", "block").option("chain", dir)
        .option("lagBlocks", lag)
        .load()
        .select("block_number")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000); q.stop()
    }
    // first run sees only the first half of the chain (tip held back),
    // second run (restored from the checkpoint) must deliver exactly the rest
    run(lag = EthFixtures.Blocks / 2)
    val firstCount = spark.read.parquet(out).count()
    assert(firstCount == EthFixtures.Blocks / 2, s"first run: $firstCount")
    run(lag = 0)
    val all = spark.read.parquet(out)
    assert(all.count() == EthFixtures.Blocks, s"after restart: ${all.count()}")
    assert(all.distinct().count() == EthFixtures.Blocks, "duplicate blocks delivered")
  }

  test("erc20 decode also streams (same source, decode branch)") {
    val dir = EthFixtures.ensure(spark)
    val q = spark.readStream.format("ethereum")
      .option("table", "erc20").option("chain", dir)
      .load()
      .writeStream.format("memory").queryName("erc20_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("erc20_stream").count()
    val batch = spark.read.format("ethereum")
      .option("table", "erc20").option("chain", dir).load().count()
    assert(streamed == batch, s"$streamed != $batch")
    q.stop()
  }

  test("lagBlocks holds the stream back from the tip (finality model)") {
    val dir = EthFixtures.ensure(spark)
    val stream = spark.readStream.format("ethereum")
      .option("table", "block").option("chain", dir)
      .option("lagBlocks", 100)
      .load()
    val q = stream.writeStream.format("memory").queryName("eth_stream_lag")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val mx = spark.table("eth_stream_lag").agg(max("block_number")).head().getLong(0)
    assert(mx == EthFixtures.Blocks - 100, s"max block $mx")
    q.stop()
  }
  test("windowed erc20 token volume over the chain stream matches batch") {
    import org.apache.spark.sql.functions._
    val dir = EthFixtures.ensure(spark)
    val stream = spark.readStream.format("ethereum")
      .option("table", "erc20").option("chain", dir)
      .option("maxBlocksPerBatch", 2048).load()
      .groupBy((col("erc20_blockNumber") / 1000).cast("long").as("blk_k"), col("erc20_token"))
      .agg(count(lit(1)).as("n"), round(sum(col("erc20_value")), 2).as("vol"))
    val q = stream.writeStream.format("memory").queryName("erc20_win")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("erc20_win")
    val batch = spark.read.format("ethereum")
      .option("table", "erc20").option("chain", dir).load()
      .groupBy((col("erc20_blockNumber") / 1000).cast("long").as("blk_k"), col("erc20_token"))
      .agg(count(lit(1)).as("n"), round(sum(col("erc20_value")), 2).as("vol"))
    assert(streamed.count() == batch.count() && streamed.count() > 0)
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
    q.stop()
  }

  /** Round-8 live-transport soak (round-7 review item 8): the reorg/lag
    * contract proven above over the fixture backend, re-proven over the
    * REAL `JsonRpcChainClient` against an in-process JSON-RPC server whose
    * chain state mutates mid-stream — tip advances, then a depth-5 reorg
    * lands inside the lag window — while every 6th HTTP exchange dies with
    * a 503. The client's transport retry must absorb every injected
    * failure (driver-side tip polls AND executor-side block fetches), and
    * the offset bookkeeping must stay gap-free: batch offset ranges chain
    * contiguously and every height lands in the sink exactly once, from
    * the winning branch. */
  test("live JSON-RPC soak: transient 503s + in-lag reorg stay gap-free over the real transport") {
    import com.fasterxml.jackson.databind.JsonNode
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    import java.net.InetSocketAddress
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    @volatile var chain: Map[Long, graft.sources.eth.EthBlockData] =
      (1L to 30L).map(n => n -> mkBlock(n, "a")).toMap
    @volatile var tip = 30L
    val exchanges = new java.util.concurrent.atomic.AtomicLong(0)
    val injected = new java.util.concurrent.atomic.AtomicLong(0)

    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      try {
        val body = mapper.readTree(ex.getRequestBody)
        if (exchanges.incrementAndGet() % 6 == 0) {
          injected.incrementAndGet()
          ex.sendResponseHeaders(503, -1) // transient: client must retry
        } else {
          def answer(req: JsonNode): JsonNode = {
            val result: JsonNode = req.get("method").asText() match {
              case "eth_blockNumber" =>
                mapper.getNodeFactory.textNode(RpcStubServer.hex(tip))
              case "eth_getBlockByNumber" =>
                val n = java.lang.Long.parseLong(
                  req.get("params").get(0).asText().drop(2), 16)
                chain.get(n)
                  .map(RpcStubServer.renderBlock(_, req.get("params").get(1).asBoolean()))
                  .getOrElse(mapper.nullNode()): JsonNode
              case m => throw new IllegalArgumentException(s"unexpected in soak: $m")
            }
            val resp = mapper.createObjectNode()
            resp.put("jsonrpc", "2.0")
            resp.set[JsonNode]("id", req.get("id"))
            resp.set[JsonNode]("result", result)
            resp
          }
          val out: JsonNode =
            if (body.isArray) {
              val a = mapper.createArrayNode(); body.forEach(r => a.add(answer(r))); a
            } else answer(body)
          val bytes = mapper.writeValueAsBytes(out)
          ex.getResponseHeaders.add("Content-Type", "application/json")
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
        }
      } finally ex.close()
    })
    server.start()
    val q = spark.readStream.format("ethereum")
      .option("table", "block")
      .option("chain", s"http://127.0.0.1:${server.getAddress.getPort}/")
      .option("maxBlocksPerBatch", 7).option("lagBlocks", 5)
      .load()
      .select("block_number", "block_hash")
      .writeStream.format("memory").queryName("rpc_soak")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      // phase 1: branch A 1..30, lag 5 -> 1..25 visible
      q.processAllAvailable()
      assert(spark.table("rpc_soak").collect().map(_.getLong(0)).sorted.toSeq
        == (1L to 25L))
      // phase 2: the live tip advances (A extends to 40) -> 1..35 visible
      chain = chain ++ (31L to 40L).map(n => n -> mkBlock(n, "a"))
      tip = 40L
      q.processAllAvailable()
      assert(spark.table("rpc_soak").collect().map(_.getLong(0)).sorted.toSeq
        == (1L to 35L))
      // phase 3: depth-5 reorg INSIDE the lag window (heights 36..40 were
      // never emitted) — branch B replaces them and extends to 48
      chain = chain.filter(_._1 <= 35L) ++ (36L to 48L).map(n => n -> mkBlock(n, "b"))
      tip = 48L
      q.processAllAvailable()
      val rows = spark.table("rpc_soak").collect()
        .map(r => r.getLong(0) -> r.getString(1))
      assert(rows.map(_._1).sorted.toSeq == (1L to 43L),
        s"heights ${rows.map(_._1).sorted.mkString(",")}")
      val byHeight = rows.toMap
      (1L to 35L).foreach(n => assert(byHeight(n) == s"0xa-$n"))
      (36L to 43L).foreach(n => assert(byHeight(n) == s"0xb-$n",
        s"height $n emitted orphaned block ${byHeight(n)}"))
      // offset bookkeeping: non-empty batches chain contiguously
      val ranges = q.recentProgress.toSeq
        .map(p => p.sources.head)
        .map(s => Option(s.startOffset).map(_.toLong).getOrElse(0L) ->
                  Option(s.endOffset).map(_.toLong).getOrElse(0L))
        .filter { case (s, e) => e > s }
        .sortBy(_._1)
      assert(ranges.nonEmpty)
      ranges.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(s2 == e1,
          s"offset gap: batch ended at $e1, next started at $s2")
        case _ => ()
      }
      // the soak genuinely soaked: transient failures fired and were absorbed
      assert(injected.get() >= 3, s"only ${injected.get()} failures injected")
    } finally { q.stop(); server.stop(0) }
  }

  /** Round-12 (round-11 review item 4): the live soak above proves the
    * SOURCE's reorg/lag contract; this drives a STATEFUL consumer — SCD2
    * dimension maintenance ([[EventStreams.scd2Stream]]) — end-to-end over
    * the same mutating chain + flaky transport, and asserts the drained
    * closed-version history equals the batch SCD2 fold of the WINNING
    * branch (reference tip semantics `EthereumSplitManager.java:51-57`).
    * The dimension: per-miner attribute = `block_extraData`, which both
    * flips every 4 heights AND carries the branch marker — so a single
    * orphaned branch-A block leaking past the lag window would open a
    * phantom version and corrupt the history. */
  test("live SCD2 over a mutating chain equals the batch history of the winning branch") {
    import com.fasterxml.jackson.databind.JsonNode
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    import java.net.InetSocketAddress
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def dimBlock(n: Long, ver: String): graft.sources.eth.EthBlockData =
      mkBlock(n, ver).copy(miner = s"0xm${n % 3}",
        extraData = s"$ver-${(n / 4) % 2}")
    @volatile var chain: Map[Long, graft.sources.eth.EthBlockData] =
      (1L to 30L).map(n => n -> dimBlock(n, "a")).toMap
    @volatile var tip = 30L
    val exchanges = new java.util.concurrent.atomic.AtomicLong(0)
    val injected = new java.util.concurrent.atomic.AtomicLong(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      try {
        val body = mapper.readTree(ex.getRequestBody)
        if (exchanges.incrementAndGet() % 6 == 0) {
          injected.incrementAndGet()
          ex.sendResponseHeaders(503, -1)
        } else {
          def answer(req: JsonNode): JsonNode = {
            val result: JsonNode = req.get("method").asText() match {
              case "eth_blockNumber" =>
                mapper.getNodeFactory.textNode(RpcStubServer.hex(tip))
              case "eth_getBlockByNumber" =>
                val n = java.lang.Long.parseLong(
                  req.get("params").get(0).asText().drop(2), 16)
                chain.get(n)
                  .map(RpcStubServer.renderBlock(_, req.get("params").get(1).asBoolean()))
                  .getOrElse(mapper.nullNode()): JsonNode
              case m => throw new IllegalArgumentException(s"unexpected in scd2 soak: $m")
            }
            val resp = mapper.createObjectNode()
            resp.put("jsonrpc", "2.0")
            resp.set[JsonNode]("id", req.get("id"))
            resp.set[JsonNode]("result", result)
            resp
          }
          val out: JsonNode =
            if (body.isArray) {
              val a = mapper.createArrayNode(); body.forEach(r => a.add(answer(r))); a
            } else answer(body)
          val bytes = mapper.writeValueAsBytes(out)
          ex.getResponseHeaders.add("Content-Type", "application/json")
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
        }
      } finally ex.close()
    })
    server.start()
    val blocks = spark.readStream.format("ethereum")
      .option("table", "block")
      .option("chain", s"http://127.0.0.1:${server.getAddress.getPort}/")
      .option("maxBlocksPerBatch", 7).option("lagBlocks", 5)
      .load()
    val scd = EventStreams.scd2Stream(blocks.select(
      expr("CAST(substr(block_miner, 4) AS LONG)").as("user_id"),
      col("block_number").as("event_id"),
      col("block_extraData").as("event_type"),
      timestamp_seconds(col("block_timestamp")).as("ts")))
    val q = scd.toDF().writeStream.format("memory").queryName("scd2_soak")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    try {
      q.processAllAvailable()                     // phase 1: A 1..30 -> 1..25
      chain = chain ++ (31L to 40L).map(n => n -> dimBlock(n, "a"))
      tip = 40L
      q.processAllAvailable()                     // phase 2: tip advance -> 1..35
      chain = chain.filter(_._1 <= 35L) ++ (36L to 48L).map(n => n -> dimBlock(n, "b"))
      tip = 48L
      q.processAllAvailable()                     // phase 3: in-lag reorg -> 1..43
      val streamed = spark.table("scd2_soak")
        .select($"user_id", $"ver", $"attr", $"valid_from", $"valid_to", $"n_events")
      // batch twin over the winning branch's emitted range (heights 1..43):
      // the scd2History fold, inlined, restricted to CLOSED versions
      val input = chain.filter(_._1 <= 43L).values.toSeq.sortBy(_.number)
        .map(b => (b.miner.drop(3).toLong, b.number, b.extraData, b.timestamp * 1000L))
        .toDF("user_id", "event_id", "attr", "ms")
      val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
      val wv = Window.partitionBy($"user_id").orderBy($"valid_from", $"ver")
      val batch = input
        .withColumn("brk", when(lag($"attr", 1).over(w).isNull ||
          lag($"attr", 1).over(w) =!= $"attr", 1L).otherwise(0L))
        .withColumn("ver", sum($"brk").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"ver", $"attr")
        .agg(min($"ms").as("valid_from"), count(lit(1)).as("n_events"))
        .withColumn("valid_to", lead($"valid_from", 1).over(wv))
        .filter($"valid_to".isNotNull)
        .select($"user_id", $"ver", $"attr", $"valid_from", $"valid_to", $"n_events")
      assert(batch.count() > 5, "dimension degenerate — no attribute flips")
      assert(streamed.count() == batch.count(),
        s"closed versions: streamed ${streamed.count()} vs batch ${batch.count()}")
      assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty,
        "streamed SCD2 history diverges from the winning branch's batch fold")
      assert(injected.get() >= 3, s"only ${injected.get()} failures injected")
    } finally { q.stop(); server.stop(0) }
  }

  /** Round-13 (round-12 review item 5): the upsert CDC loop — the
    * [[graft.operators.Pipeline.upsert]] foreachBatch MERGE that
    * eth_stream_mirror gates against its fixture-dir oracle — driven over
    * the LIVE JSON-RPC transport with a mutating chain (tip advance,
    * DEEPER-than-lag reorg, 503 every 6th exchange), ending in the
    * winning-branch equality assert the SCD2 soak established. The deep
    * reorg (depth 8 > lag 5) forces three already-mirrored heights stale,
    * so the bounded-depth reconcile leg is exercised under the real
    * transport too — not just the happy append path. */
  test("live upsert CDC mirror over a mutating chain equals the winning branch") {
    import com.fasterxml.jackson.databind.JsonNode
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    import java.net.InetSocketAddress
    import spark.implicits._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    @volatile var chain: Map[Long, graft.sources.eth.EthBlockData] =
      (1L to 30L).map(n => n -> mkBlock(n, "a")).toMap
    @volatile var tip = 30L
    val exchanges = new java.util.concurrent.atomic.AtomicLong(0)
    val injected = new java.util.concurrent.atomic.AtomicLong(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      try {
        val body = mapper.readTree(ex.getRequestBody)
        if (exchanges.incrementAndGet() % 6 == 0) {
          injected.incrementAndGet()
          ex.sendResponseHeaders(503, -1)
        } else {
          def answer(req: JsonNode): JsonNode = {
            val result: JsonNode = req.get("method").asText() match {
              case "eth_blockNumber" =>
                mapper.getNodeFactory.textNode(RpcStubServer.hex(tip))
              case "eth_getBlockByNumber" =>
                val n = java.lang.Long.parseLong(
                  req.get("params").get(0).asText().drop(2), 16)
                chain.get(n)
                  .map(RpcStubServer.renderBlock(_, req.get("params").get(1).asBoolean()))
                  .getOrElse(mapper.nullNode()): JsonNode
              case m => throw new IllegalArgumentException(s"unexpected in cdc soak: $m")
            }
            val resp = mapper.createObjectNode()
            resp.put("jsonrpc", "2.0")
            resp.set[JsonNode]("id", req.get("id"))
            resp.set[JsonNode]("result", result)
            resp
          }
          val out: JsonNode =
            if (body.isArray) {
              val a = mapper.createArrayNode(); body.forEach(r => a.add(answer(r))); a
            } else answer(body)
          val bytes = mapper.writeValueAsBytes(out)
          ex.getResponseHeaders.add("Content-Type", "application/json")
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
        }
      } finally ex.close()
    })
    server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}/"
    val work = java.nio.file.Files.createTempDirectory("cdc-mirror").toString
    val cols = Seq("block_number", "block_hash", "block_miner", "block_timestamp")
    var cur = s"$work/v0"
    var vn = 0
    spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(
          "block_number LONG, block_hash STRING, block_miner STRING, block_timestamp LONG"))
      .write.mode("overwrite").parquet(cur)
    val st = spark.readStream.format("ethereum").option("table", "block")
      .option("chain", url)
      .option("maxBlocksPerBatch", 7).option("lagBlocks", 5)
      .load().selectExpr(cols: _*)
    val merge: (org.apache.spark.sql.DataFrame, Long) => Unit = (batch, _) => {
      vn += 1
      val next = s"$work/v$vn"
      graft.operators.Pipeline.upsert(
          spark.read.parquet(cur), batch.selectExpr(cols: _*), "block_number")
        .write.mode("overwrite").parquet(next)
      cur = next
    }
    val q = st.writeStream.foreachBatch(merge)
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.ProcessingTime(50)).start()
    try {
      q.processAllAvailable()                   // phase 1: A 1..30 -> 1..25
      chain = chain ++ (31L to 40L).map(n => n -> mkBlock(n, "a"))
      tip = 40L
      q.processAllAvailable()                   // phase 2: advance -> 1..35
      // phase 3: DEEP reorg (depth 8 > lag 5): 33..35 already mirrored
      // from branch A are now stale
      chain = chain.filter(_._1 <= 32L) ++ (33L to 48L).map(n => n -> mkBlock(n, "b"))
      tip = 48L
      q.processAllAvailable()                   // appends 36..43 from B
      q.stop()
      val mirror0 = spark.read.parquet(cur)
      // the stream's lag bound means the stale heights are EXPECTED here —
      // that is the gap reconcile exists to close
      val staleA = mirror0.filter($"block_number".between(33, 35) &&
        $"block_hash".startsWith("0xa")).count()
      assert(staleA == 3, s"expected 3 stale branch-A heights pre-reconcile, got $staleA")
      // reconcile leg over the live transport: batch tail scan + hash
      // anti-join + upsert (the eth_stream_mirror shape)
      val mmax = mirror0.agg(max($"block_number")).head().getLong(0)
      val tail = spark.read.format("ethereum").option("table", "block")
        .option("chain", url).load()
        .filter($"block_number".between(mmax - 15, mmax)).selectExpr(cols: _*)
      val stale = tail.join(mirror0.select($"block_number", $"block_hash"),
        Seq("block_number", "block_hash"), "left_anti")
      val fixed = graft.operators.Pipeline.upsert(mirror0, stale, "block_number")
      // winning-branch equality: the mirror is exactly the final chain's
      // blocks 1..43 (tip 48, lag 5)
      val want = chain.filter(_._1 <= 43L).values.toSeq
        .map(b => (b.number, b.hash, b.miner, b.timestamp))
        .toDF(cols: _*)
      assert(fixed.count() == 43)
      assert(fixed.except(want).isEmpty && want.except(fixed).isEmpty,
        "CDC mirror diverges from the winning branch after reconcile")
      assert(injected.get() >= 3, s"only ${injected.get()} failures injected")
    } finally { q.stop(); server.stop(0) }
  }

}

class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("windowed streaming aggregation matches the batch computation") {
    val agg = EventStreams.windowedStats(EventStreams.readEvents(spark, sf))
    val q = agg.writeStream.format("memory").queryName("win_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("win_stream")

    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"),
              col("total_value"))
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
    q.stop()
  }

  test("streaming dedup state survives a checkpoint restart (no re-emission)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dedupckpt-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("dedupckpt").toString
    val out = java.nio.file.Files.createTempDirectory("dedupckpt-out").toString
    def runOnce(): Unit = {
      val in = spark.readStream
        .schema("doc_id LONG, ms LONG, text STRING")
        .parquet(s"$dir/f*.parquet")
        .withColumn("ts", timestamp_millis(col("ms")))
      val q = EventStreams.streamingDedup(in, horizon = "1 hour")
        .select("doc_id", "text_key")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000); q.stop()
    }
    Seq((1L, 1000L, "alpha doc"), (2L, 2000L, "beta doc"))
      .toDF("doc_id", "ms", "text").coalesce(1).write.parquet(s"$dir/f1.parquet")
    runOnce()
    // second run: one duplicate of a PREVIOUS batch + one new doc; the
    // restored state store must drop the duplicate
    Seq((3L, 3000L, "ALPHA doc"), (4L, 4000L, "gamma doc"))
      .toDF("doc_id", "ms", "text").coalesce(1).write.parquet(s"$dir/f2.parquet")
    runOnce()
    val got = spark.read.parquet(out).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 4L), s"state not restored across restart: $got")
  }

  test("streaming dedup keeps one row per canonical digest across micro-batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dedupstream").toString
    // two files -> two micro-batches; duplicates within and ACROSS batches
    Seq(
      (1L, 1000L, "Hello, World!"), (2L, 2000L, "hello   world"),
      (3L, 3000L, "unique one"), (4L, 4000L, "Another doc.")
    ).toDF("doc_id", "ms", "text").coalesce(1)
      .write.parquet(s"$dir/f1.parquet")
    Seq(
      (5L, 5000L, "HELLO WORLD"), (6L, 6000L, "another DOC"),
      (7L, 7000L, "fresh content")
    ).toDF("doc_id", "ms", "text").coalesce(1)
      .write.parquet(s"$dir/f2.parquet")

    val in = spark.readStream
      .schema("doc_id LONG, ms LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/f*.parquet")
      .withColumn("ts", timestamp_millis(col("ms")))
    val deduped = EventStreams.streamingDedup(in, horizon = "1 hour")
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val kept = spark.table("dedup_stream").select("doc_id", "text_key").collect()
    // 4 canonical classes: hello-world, unique-one, another-doc, fresh-content
    assert(kept.length == 4, s"kept ${kept.map(_.getLong(0)).mkString(",")}")
    assert(kept.map(_.getString(1)).distinct.length == 4)
    // cross-batch duplicates (5, 6) must be dropped by state, not batch-local dedup
    val ids = kept.map(_.getLong(0)).toSet
    assert(!ids.contains(5L) && !ids.contains(6L), s"cross-batch dup survived: $ids")
    q.stop()
  }

  test("streaming first-seen aggregate: an earlier day arriving in a later batch wins") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("newusers").toString
    // the adversarial split for any dropDuplicates-style formulation:
    // user 1's EARLIEST day (2) arrives in the SECOND micro-batch, after
    // day 5 was already seen — the min-aggregate state must update
    Seq((1L, 5L), (2L, 3L)).toDF("user_id", "day")
      .coalesce(1).write.parquet(s"$dir/f1.parquet")
    Seq((1L, 2L), (3L, 4L)).toDF("user_id", "day")
      .coalesce(1).write.parquet(s"$dir/f2.parquet")
    val in = spark.readStream.schema("user_id LONG, day LONG")
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/f*.parquet")
    val firstSeen = in.groupBy($"user_id").agg(min($"day").as("fday"))
    val q = firstSeen.writeStream.format("memory").queryName("newusers_inv")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "drain did not finish")
    val got = spark.table("newusers_inv").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 3L, 3L -> 4L),
      s"cross-batch min must win: $got")
    q.stop()
  }

  test("drained audience-growth curve equals the batch first-seen curve") {
    import spark.implicits._
    val stream = graft.operators.StreamQueries.streamNewUsers(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // the batch curve also emits zero-new-user days; the stream's state
    // only holds days some user first appeared on — equal where defined
    val batch = graft.operators.Events.cumulativeDistinct(spark, sf)
      .filter($"new_users" > 0)
      .select($"day", $"new_users", $"cum_users")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(stream == batch,
      s"stream=${stream.take(3)}… batch=${batch.take(3)}…")
  }

  test("sessionization emits exactly the closed sessions of the batch fold") {
    val gapMs = 30 * 60 * 1000L
    val out = EventStreams.sessionize(EventStreams.readEvents(spark, sf), gapMs)
    val q = out.writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("sess_stream")
      .select("user_id", "session_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    // batch oracle: fold per user in the driver; all but the last session
    // per user are closed
    val events = Tables.events(spark, sf)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val expected = events.flatMap { case (user, ts) =>
      val sessions = ts.foldLeft(List.empty[(Long, Long, Int)]) {
        case ((s, last, n) :: rest, t) if t - last <= gapMs => (s, t, n + 1) :: rest
        case (acc, t) => (t, t, 1) :: acc
      }.reverse
      sessions.dropRight(1).map { case (s, _, n) => (user, s, n) }
    }.toSet
    assert(streamed == expected,
      s"streamed ${streamed.size} sessions vs expected ${expected.size}")
    q.stop()
  }

  test("streaming ANN over a static IVF index matches the batch top-k") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Similarity
    import spark.implicits._
    val d = sf
    val vecs = Tables.embeddings(spark, d)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    // static index, same parameters as the batch knnIvf defaults
    val centDf = Similarity.lloydCentroids(vecs, 16, Similarity.DefaultLloydIters)
    val lists = Similarity.coarseAssign(vecs, centDf)
    val centroids = centDf.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
    // queries arrive across two micro-batches
    val allQ = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    implicit val sq = spark.sqlContext
    val source = MemoryStream[(Long, Seq[Double])]
    val out = graft.streaming.StreamingAnn.knnStream(
      source.toDF().toDF("query_id", "qv"), lists, centroids, k = 5, nProbe = 4)
    val q = out.writeStream.format("memory").queryName("ann_stream")
      .outputMode("complete").start()
    try {
      source.addData(allQ.take(2).toSeq)
      q.processAllAvailable()
      source.addData(allQ.drop(2).toSeq)
      q.processAllAvailable()
      val streamed = spark.table("ann_stream").collect().map { r =>
        r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(p => p.getLong(0)).toList
      }.toMap
      val batch = Similarity.knnIvf(spark, d).collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.sortBy(_.getLong(3)).map(_.getLong(1)).toList).toMap
      assert(streamed.keySet == batch.keySet)
      // identical neighbors in identical order: pinned tie-breaks on both
      // paths (sim desc, neighbor asc) make the comparison exact
      batch.foreach { case (qid, neighbors) =>
        assert(streamed(qid) == neighbors,
          s"query $qid: stream ${streamed(qid)} vs batch $neighbors")
      }
    } finally q.stop()
  }
}

/** Streaming ingest dedup vs the batch incremental verdict. */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("streaming dedup against the static band store matches the batch verdicts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Dedup
    import spark.implicits._
    val cut = 250L
    val docs = Tables.documents(spark, sf)
    val store = Dedup.minhashBandStore(docs.filter(col("doc_id") < cut))
    val batchDocs = docs.filter(col("doc_id") >= cut)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    implicit val sq = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamingDedup.dedupStream(
      source.toDF().toDF("doc_id", "text"), store)
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("complete").start()
    try {
      // docs arrive across two micro-batches
      source.addData(batchDocs.take(100).toSeq)
      q.processAllAvailable()
      source.addData(batchDocs.drop(100).toSeq)
      q.processAllAvailable()
      val streamed = spark.table("dedup_stream").collect()
        .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      val batch = Dedup.minhashIncrementalQuery(spark, sf, cut).collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap // dup_corpus
      assert(streamed.keySet == batch.keySet,
        s"stream emitted ${streamed.size} verdicts vs batch ${batch.size}")
      batch.foreach { case (id, dup) =>
        assert(streamed(id) == dup, s"doc $id: stream ${streamed(id)} vs batch $dup")
      }
      assert(streamed.values.exists(identity) && streamed.values.exists(!_))
    } finally q.stop()
  }

  test("streaming count-min cells equal the batch sketch after the stream drains") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.TextAnalysis
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    implicit val sq = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamingCms.cmsStream(
      source.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      source.addData(docs.take(200).toSeq)
      q.processAllAvailable()
      source.addData(docs.drop(200).toSeq)
      q.processAllAvailable()
      val streamed = spark.table("cms_stream").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      // state is bounded by construction: never more than depth x width
      assert(streamed.size <= 4 * 1024, s"cell state exploded: ${streamed.size}")
      // batch cells built by the same hash family over the same corpus
      val batch = Tables.documents(spark, sf)
        .select(explode(TextAnalysis.wsTokens(TextAnalysis.canonical(col("text")))).as("token"))
        .filter(col("token") =!= "")
        .select(posexplode(array((0 until 4).map(j =>
          TextAnalysis.cmsBucket(j, col("token"), 1024)): _*)).as(Seq("j", "b")))
        .groupBy(col("j"), col("b")).agg(count(lit(1)).as("c")).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed == batch, "streamed cells diverge from the batch sketch")
      // the read path: a known-frequent token's estimate covers its count
      val (top, exact) = TextAnalysis.vocabTopK(spark, sf, 1).collect()
        .map(r => (r.getString(0), r.getLong(1))).head
      val est = graft.streaming.StreamingCms.estimate(spark.table("cms_stream"), top)
      assert(est >= exact, s"estimate $est under-counts '$top' ($exact)")
      // a token the stream never saw reads as >= 0 with missing cells
      // treated as zero — not an NPE, and never under its true count (0)
      val unseen = graft.streaming.StreamingCms.estimate(
        spark.table("cms_stream"), "zz-token-the-corpus-cannot-contain-zz")
      assert(unseen >= 0L, s"unseen-token estimate went negative: $unseen")
    } finally q.stop()
  }
}
