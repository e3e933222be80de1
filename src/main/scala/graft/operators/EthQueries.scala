package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Web3Functions
import graft.sources.eth.EthFixtures

/** The reference's declared query corpus (SURVEY.md §2C, from
  * `/root/reference/use-cases.sql:1-42` + `README.md:77-196`) run through the
  * `ethereum` DataSource V2 source against the deterministic fixture chain.
  *
  * Differential setup: the engine path reads the raw JSONL chain through the
  * DSv2 source (scan + pushdown + ERC-20 decode); the oracle SQL reads the
  * *expected* parquet tables the fixture generator derived independently from
  * the generation parameters. A hash match therefore checks the whole scan
  * and decode pipeline, not just the relational tail.
  */
object EthQueries {
  private def eth(s: SparkSession, table: String): DataFrame = {
    val dir = EthFixtures.ensure(s)
    s.read.format("ethereum").option("table", table).option("chain", dir).load()
  }

  private val exp = s"${EthFixtures.DefaultDir}/expected"
  private[operators] def withEthTables(sql: String, recursive: Boolean = false): String = {
    val kw = if (recursive) "WITH RECURSIVE" else "WITH"
    s"""$kw block AS (SELECT * FROM read_parquet('$exp/block/*.parquet')),
        transaction AS (SELECT * FROM read_parquet('$exp/transaction/*.parquet')),
        erc20 AS (SELECT * FROM read_parquet('$exp/erc20/*.parquet')),
        erc20_exact AS (SELECT * FROM read_parquet('$exp/erc20_exact/*.parquet'))
        $sql"""
  }

  /** Q1: block-time deltas via consecutive-block self-join
    * (`use-cases.sql:5-15`), bucketed per 1000 blocks. */
  def q1BlockTime(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val b = eth(s, "block").select($"block_number", $"block_timestamp")
    b.as("a").join(b.as("b"), col("b.block_number") === col("a.block_number") + 1)
      .select(expr("a.block_number div 1000").as("blk_k"),
              (col("b.block_timestamp") - col("a.block_timestamp")).as("delta"))
      .groupBy($"blk_k")
      .agg(count(lit(1)).as("n"),
           round(avg($"delta"), 4).as("avg_delta"),
           min($"delta").as("min_delta"),
           max($"delta").as("max_delta"))
      .orderBy($"blk_k")
  }

  /** Q2: CTE + ntile bucketing (`use-cases.sql:18-34`) over gas usage. */
  def q2NtileGas(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.orderBy($"block_number")
    eth(s, "block")
      .select($"block_number", $"block_gasUsed", ntile(10).over(w).cast("long").as("nt"))
      .groupBy($"nt")
      .agg(round(avg($"block_gasUsed"), 4).as("avg_gas"),
           round(max($"block_gasUsed"), 2).as("max_gas"),
           count(lit(1)).as("n"))
      .orderBy($"nt")
  }

  /** Q3: top-15 miners under a block-range predicate
    * (`use-cases.sql:37-42`) — the pushdown narrows the scan. */
  def q3TopMiners(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    eth(s, "block")
      .filter($"block_number" <= 5000)
      .groupBy($"block_miner")
      .agg(count(lit(1)).as("num"))
      .orderBy($"num".desc, $"block_miner")
      .limit(15)
  }

  /** Q4: ERC-20 movement sum by token over a block range
    * (`README.md:124-127`) — drives the decode scan + range pushdown. */
  def q4Erc20Movement(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    eth(s, "erc20")
      .filter($"erc20_blockNumber".between(2000, 4000))
      .groupBy($"erc20_token")
      .agg(round(sum($"erc20_value"), 2).as("total_moved"),
           count(lit(1)).as("n_transfers"))
      .orderBy($"erc20_token")
  }

  /** Q5: `fromWei` unit-conversion projection (`README.md:189-196`). */
  def q5FromWei(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Web3Functions.register(s, EthFixtures.ensure(s))
    eth(s, "transaction")
      .filter($"tx_blockNumber".between(100, 200))
      .select($"tx_hash",
              round(call_udf("fromWei", $"tx_value", lit("ether")), 6).as("eth_value"),
              round(call_udf("fromWei", $"tx_gasPrice", lit("gwei")), 4).as("gwei_price"))
      .orderBy($"tx_hash")
  }

  /** Timestamp-range scan — exercises the timestamp→block binary-search
    * pushdown (A9, `EthereumMetadata.java:215-229`). */
  def q6TsRange(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    eth(s, "block")
      .filter($"block_timestamp".between(1438282988L, 1438295988L))
      .agg(count(lit(1)).as("n_blocks"),
           min($"block_number").as("min_bn"), max($"block_number").as("max_bn"),
           min($"block_timestamp").as("min_ts"), max($"block_timestamp").as("max_ts"))
  }

  /** Block-hash point lookup — exercises the hash→number rewrite (A8). */
  def q7HashLookup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    eth(s, "block")
      .filter($"block_hash" === EthFixtures.blockHash(1234))
      .select($"block_number", $"block_miner", $"block_size", $"block_timestamp")
  }

  /** FK join transaction→block (SURVEY §1.1 relationships). */
  def q8TxPerMiner(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    eth(s, "transaction")
      .join(eth(s, "block"), $"tx_blockNumber" === $"block_number")
      .filter($"tx_blockNumber" <= 3000)
      .groupBy($"block_miner")
      .agg(count(lit(1)).as("n_tx"), round(avg($"tx_gas"), 4).as("avg_gas"))
      .orderBy($"block_miner")
  }

  /** Array-typed column surface: `block_transactions`/`block_uncles`. */
  def q9ArrayCols(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    eth(s, "block")
      .filter($"block_number" <= 500)
      .select($"block_number",
              size($"block_transactions").cast("long").as("n_tx"),
              size($"block_uncles").cast("long").as("n_uncles"),
              try_element_at($"block_transactions", lit(1)).as("first_tx"))
      .orderBy($"block_number")
  }

  /** Web3 UDF battery — nondeterministic RPC-backed functions. The fixture
    * backend derives balance/nonce/code deterministically from
    * sha256(address) ([[graft.sources.eth.FixtureChainClient]]), which
    * DuckDB can replay exactly (`sha256` + hex-digit folding) — so even the
    * "live chain state" UDFs get a differential oracle. Exercises all
    * three `eth_getBalance` shapes the reference overloads
    * (`udfs/EthereumUDFs.java:61-114`): bare, numeric height, block tag. */
  def qUdfs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Web3Functions.register(s, EthFixtures.ensure(s))
    eth(s, "transaction")
      .filter($"tx_blockNumber" <= 50 && $"tx_to".isNotNull)
      .select($"tx_hash", $"tx_from", $"tx_to",
              call_udf("eth_getBalance", $"tx_from").as("from_balance"),
              call_udf("eth_getBalance_at", $"tx_from", $"tx_blockNumber").as("from_balance_at"),
              call_udf("eth_getBalance", $"tx_from", $"tx_blockNumber").as("from_balance_ovl"),
              call_udf("eth_getBalance", $"tx_from", lit("earliest")).as("from_balance_earliest"),
              call_udf("eth_getTransactionCount", $"tx_from").as("from_nonce"),
              call_udf("eth_getTransactionCount", $"tx_from", lit("latest")).as("from_nonce_latest"),
              call_udf("isContract", $"tx_to").as("to_is_contract"),
              call_udf("toWei", call_udf("fromWei", $"tx_value", lit("ether")), lit("ether")).as("roundtrip"),
              call_udf("eth_blockNumber").as("tip"),
              call_udf("eth_gasPrice").as("gas_price"))
      .orderBy($"tx_hash")
  }

  /** Q36: the BATCHED table-valued account-state path
    * ([[Web3Functions.accountStates]]) over the distinct senders of the
    * first 50 blocks — the live-mode-viable replacement for issuing the
    * A16/A17 scalar UDFs row by row. Against the fixture chain the
    * balances/nonces are the sha256-seeded account state the eth_udfs
    * oracle already replays; JsonRpcSpec separately proves the batched
    * JSON-RPC transport returns identical values with
    * ceil(N/batchSize) HTTP exchanges. */
  def q36AccountBatch(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = EthFixtures.ensure(s)
    val addrs = eth(s, "transaction")
      .filter($"tx_blockNumber" <= 50 && $"tx_from".isNotNull)
      .select($"tx_from".as("addr")).distinct()
    Web3Functions.accountStates(addrs, dir, None, batchSize = 64)
      .orderBy($"addr")
  }

  /** Q2's gas bucketing via the scale path ([[graft.plans.ScalableNtile]]):
    * same output as eth_q2, no single-partition sort. */
  def q10NtileScalable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (binned, freeNtile) = graft.plans.ScalableNtile.ntileDetachable(
      eth(s, "block").select($"block_number", $"block_gasUsed"),
      10, Seq($"block_number"), bucketCol = "nt")
    val agg = binned
      .groupBy($"nt")
      .agg(round(avg($"block_gasUsed"), 4).as("avg_gas"),
           round(max($"block_gasUsed"), 2).as("max_gas"),
           count(lit(1)).as("n"))
      .orderBy($"nt")
    graft.plans.Caching.detach(agg, freeNtile)
  }

  /** Q11 (extension surface): the same ERC-20 movement aggregate as Q4,
    * but computed from the raw `log` table through the standalone
    * [[graft.functions.Erc20TransfersGenerator]] SQL generator — for users
    * holding exported receipt logs instead of reading the fused `erc20`
    * scan. Shares Q4's oracle (the expected erc20 parquet), so the two
    * decode paths are proven identical. */
  def q11LogDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.functions.Expressions.register(s)
    eth(s, "log").createOrReplaceTempView("eth_raw_logs")
    s.sql(
      """SELECT t.erc20_token, round(sum(t.erc20_value), 2) AS total_moved,
                count(*) AS n_transfers
         FROM eth_raw_logs
         LATERAL VIEW erc20_transfers(log_address, log_topics, log_data,
                                      log_txHash, log_blockNumber) t
         WHERE log_blockNumber BETWEEN 2000 AND 4000
         GROUP BY t.erc20_token ORDER BY t.erc20_token""")
  }

  /** The `weiDecimal` quality mode as an oracle row: the erc20 scan with
    * exact DECIMAL(38,0) wei values (SURVEY.md §1.2's documented deviation
    * from the reference's lossy double narrowing,
    * `EthereumERC20Utils.java:8-14`) — per-token exact transfer totals.
    * Fixture blocks above [[EthFixtures.HugeValueFloor]] plant uint256
    * values beyond 2^64, which the reference's double path cannot
    * represent; the oracle replays them from the `erc20_exact` expected
    * table (decimal-digit strings). Outputs are pinned as STRING on both
    * engines — DECIMAL(38,0) is rendered identically ("123", no point) by
    * Spark and DuckDB, removing the decimal-canonicalization ambiguity
    * that the round-5 driver hash tripped on. */
  def q12WeiDecimal(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = EthFixtures.ensure(s)
    s.read.format("ethereum").option("table", "erc20").option("chain", dir)
      .option("weiDecimal", "true").load()
      .groupBy($"erc20_token")
      .agg(count(lit(1)).as("n_transfers"),
           sum($"erc20_value").cast("decimal(38,0)").cast("string").as("total_wei"),
           max($"erc20_value").cast("string").as("max_wei"))
      .orderBy($"erc20_token")
  }

  /** The `weiDecimal` mode on the TRANSACTION table (tx_value/tx_gasPrice
    * surface as DECIMAL(38,0), [[graft.sources.eth.EthSchemas.weiColumns]]) —
    * round 5 only oracle-checked erc20's decimal path. Fixture tx values
    * are integral doubles (≤1e18), so both engines' double→decimal
    * conversions are exact; outputs pinned as STRING like eth_q12. */
  def q13TxDecimal(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = EthFixtures.ensure(s)
    s.read.format("ethereum").option("table", "transaction").option("chain", dir)
      .option("weiDecimal", "true").load()
      .filter($"tx_blockNumber" <= 500)
      .groupBy(expr("tx_blockNumber div 100").as("blk_c"))
      .agg(count(lit(1)).as("n_tx"),
           sum($"tx_value").cast("decimal(38,0)").cast("string").as("total_value_wei"),
           max($"tx_gasPrice").cast("string").as("max_gas_price_wei"))
      .orderBy($"blk_c")
  }

  /** TopN-pushdown oracle row: `ORDER BY block_number LIMIT 20` plans a
    * 20-block scan (EthPlanSpec asserts the partition shape), not a
    * 512-block partition — the `SELECT * FROM block LIMIT k` gap the
    * round-5 verdict ranked #3. Deterministic: block_number is unique. */
  def q14LimitScan(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    eth(s, "block")
      .select($"block_number", $"block_miner", $"block_gasUsed")
      .orderBy($"block_number")
      .limit(20)
  }

  /** Aggregate-pushdown oracle row: count/min/max over a block range are
    * answered from range metadata (one EthereumAggPartition, zero block
    * fetches — EthPlanSpec asserts the plan). */
  def q15CountRange(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    eth(s, "block")
      .filter($"block_number".between(500, 4500))
      .agg(count(lit(1)).as("n_blocks"),
           min($"block_number").as("min_bn"),
           max($"block_number").as("max_bn"))
  }

  /** Transfer-graph degree profile per token — the "who trades with whom"
    * summary an Ethereum analytics user runs before any graph algorithm:
    * transfer count, distinct senders/receivers, and distinct directed
    * edges. All four are one hash-aggregate pass over the decoded transfer
    * scan (distincts expand to partial aggregates per group); nothing is
    * collected, so the shape holds when the transfer table is data-scale. */
  def q16TokenGraph(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    eth(s, "erc20")
      .groupBy($"erc20_token")
      .agg(count(lit(1)).as("n_transfers"),
           countDistinct($"erc20_from").as("n_senders"),
           countDistinct($"erc20_to").as("n_receivers"),
           countDistinct(concat_ws(">", $"erc20_from", $"erc20_to")).as("n_edges"))
      .orderBy($"erc20_token")
  }

  /** PageRank over the ERC-20 transfer graph (damping 0.85, 5 fixed
    * iterations, edge weight = transfer count) — top 15 addresses. The
    * whole computation runs in EXACT INTEGER micro-units so Spark and the
    * oracle agree bit-for-bit regardless of join/aggregation order (the
    * repo's standing micro-nat discipline; float PageRank sums are
    * summation-order sensitive):
    *
    *   R₀(u) = 1 000 000;  contrib(u→v) = (R(u)·w(u,v)) div W(u);
    *   R'(v) = 150 000 + (850·Σ contrib(·→v)) div 1000.
    *
    * Dangling mass is dropped (both engines agree; ranking is unaffected
    * at the fixture's connectivity). Each iteration is ONE shuffle: join
    * ranks to the weighted edge list on src, re-aggregate by dst — the
    * standard distributed PageRank step (Pregel's shape without the
    * framework). The edge list + node set are persisted across the 5
    * iterations and freed via [[graft.plans.Caching.detach]]; per-node
    * state is one long, so at 100 TB of transfers the iteration state is
    * |V| rows, not data-scale, and every join is a plain shuffled
    * hash join on the address key. */
  /** [[q17PageRank]] before detach-materialization (plan dumps reuse the
    * exact executed pipeline). The contrib product widens to
    * DECIMAL(38,0) before the integral divide: at 1e9 addresses a hub's
    * rank reaches ~1e15 micro-units and a hot edge's count can be ≥1e5,
    * so `r·w` in plain longs would wrap (Spark wraps silently in
    * non-ANSI mode; DuckDB raises — the engines would even disagree).
    * The decimal product is exact, the quotient is back under the rank
    * bound, and `div` returns a long on both engines. */
  def q17PageRankLazy(s: SparkSession, d: String): (DataFrame, () => Unit) = {
    import s.implicits._
    // iteration state AND the loop-invariant edge/node frames all cross
    // the rounds through eager localCheckpoint (Caching.iterCheckpoint):
    // the r14 probe measured the lazy-persist columnar cache costing more
    // per read-back than the LogicalRDD cut, and the cut also stops the
    // five per-iteration jobs from re-analyzing the scan lineage
    val edges = graft.plans.Caching.iterCheckpoint(
      eth(s, "erc20")
        .groupBy($"erc20_from".as("src"), $"erc20_to".as("dst"))
        .agg(count(lit(1)).as("w")))
    val outw = edges.groupBy($"src").agg(sum($"w").as("tw"))
    val wEdges = graft.plans.Caching.iterCheckpoint(edges.join(outw, "src"))
    val nodes = graft.plans.Caching.iterCheckpoint(
      edges.select($"src".as("addr"))
        .union(edges.select($"dst".as("addr"))).distinct())
    // eager lineage truncation each round (see Caching.iterCheckpoint for
    // the measured cost of not doing this + the reliable-checkpoint mode)
    var rank = graft.plans.Caching.iterCheckpoint(nodes.withColumn("r", lit(1000000L)))
    for (_ <- 1 to 5) {
      val contribs = wEdges.join(rank, wEdges("src") === rank("addr"))
        .select($"dst", expr("(CAST(r AS DECIMAL(38,0)) * w) div tw").as("c"))
        .groupBy($"dst").agg(sum($"c").as("s"))
      rank = graft.plans.Caching.iterCheckpoint(
        nodes.join(contribs, nodes("addr") === contribs("dst"), "left")
          .select($"addr",
            (lit(150000L) + expr("(850 * CAST(coalesce(s, 0L) AS DECIMAL(38,0))) div 1000")).as("r")))
    }
    val out = rank.orderBy($"r".desc, $"addr").limit(15)
      .select($"addr", $"r".as("rank_micro"))
    (out, () => {
      graft.plans.Caching.freeCheckpoint(edges)
      graft.plans.Caching.freeCheckpoint(wEdges)
      graft.plans.Caching.freeCheckpoint(nodes)
    })
  }

  def q17PageRank(s: SparkSession, d: String): DataFrame = {
    val (out, free) = q17PageRankLazy(s, d)
    graft.plans.Caching.detach(out, free)
  }

  /** Triangle count of the UNDIRECTED transfer graph — the standard
    * graph-mining statistic (clustering/community structure), computed
    * with the degree-ordered orientation that makes it scale: every
    * undirected edge is oriented from its lower-(degree, addr) endpoint
    * to the higher, so each node's oriented out-degree is O(√E) and the
    * wedge join (pairs of out-neighbors of a common source) is bounded by
    * Σ d⁺(v)² = O(E^1.5) instead of the Σ d(v)² blow-up a hub would cause
    * un-oriented. Three shuffles total: undirected-edge dedup, degree
    * aggregate, and the wedge⋈edge closing join — the wedge set (the
    * dominant join) is materialized ONCE: wedges LEFT-join the
    * closing-edge list (unique on (v, w), so the join multiplies
    * nothing) with a marker column, and a single aggregate reads
    * `count(*)` = wedges and `count(marker)` = triangles from the same
    * pass. All counts are integers; the oracle replays the identical
    * orientation, so the row is bit-exact. This is the
    * pre-detach-materialization variant plan dumps reuse. */
  def q18TrianglesLazy(s: SparkSession, d: String): (DataFrame, () => Unit) = {
    import s.implicits._
    val t = eth(s, "erc20")
      .select(least($"erc20_from", $"erc20_to").as("a"),
              greatest($"erc20_from", $"erc20_to").as("b"))
      .filter($"a" =!= $"b").distinct()
    val und = graft.plans.Caching.iterCheckpoint(t)
    // deg is consumed repeatedly (both orientation joins + downstream
    // aggregates); lineage-cut so the union+aggregate runs once (r12
    // quiet profile: the recomputes were roughly half the query's wall
    // time; the r14 probe then measured the eager localCheckpoint beating
    // the lazy persist's columnar cache on every read-back)
    val deg = graft.plans.Caching.iterCheckpoint(
      und.select($"a".as("n")).union(und.select($"b".as("n")))
        .groupBy($"n").agg(count(lit(1)).as("deg")))
    // orient each edge toward the higher (deg, addr) endpoint
    val withDeg = und
      .join(deg.withColumnRenamed("n", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("n", "b").withColumnRenamed("deg", "db"), "b")
    val oriented = graft.plans.Caching.iterCheckpoint(withDeg.select(
        when($"da" < $"db" || ($"da" === $"db" && $"a" < $"b"),
             struct($"a".as("src"), $"b".as("dst"), $"db".as("dd")))
          .otherwise(struct($"b".as("src"), $"a".as("dst"), $"da".as("dd")))
          .as("e"))
      .select($"e.src", $"e.dst", $"e.dd"))
    // wedges: ordered pairs of out-neighbors of one source, v before w in
    // the SAME (deg, addr) orientation order, closed by an oriented edge
    val e1 = oriented.select($"src", $"dst".as("v"), $"dd".as("dv"))
    val e2 = oriented.select($"src", $"dst".as("w"), $"dd".as("dw"))
    val wedges = e1.join(e2, Seq("src"))
      .filter($"dv" < $"dw" || ($"dv" === $"dw" && $"v" < $"w"))
    val closing = oriented.select($"src".as("v"), $"dst".as("w"), lit(1).as("closed"))
    val wedgeStats = wedges.join(closing, Seq("v", "w"), "left")
      .agg(count(lit(1)).as("n_wedges"), count($"closed").as("n_triangles"))
    val out = und.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
      .crossJoin(wedgeStats)
      .select($"n_nodes", $"n_edges", $"n_wedges", $"n_triangles")
    (out, () => {
      graft.plans.Caching.freeCheckpoint(und)
      graft.plans.Caching.freeCheckpoint(deg)
      graft.plans.Caching.freeCheckpoint(oriented)
    })
  }

  def q18Triangles(s: SparkSession, d: String): DataFrame = {
    val (out, free) = q18TrianglesLazy(s, d)
    graft.plans.Caching.detach(out, free)
  }

  /** Q35: neighborhood-Jaccard profile of the undirected transfer graph —
    * the link-prediction / address-clustering statistic: for every edge
    * (u,v), J = |N(u)∩N(v)| / |N(u)∪N(v)| with |N(u)∪N(v)| =
    * deg(u)+deg(v)−common (endpoints count once each; no self-loops, so
    * the denominator is ≥ 2 — never a divide-by-zero). Common-neighbor
    * counts come from the SAME degree-ordered oriented wedge join as
    * [[q18TrianglesLazy]] (each triangle enumerated exactly once, fan-out
    * bounded at O(√E) per node), then each triangle fans out to its three
    * canonical edges and one hash aggregate yields per-edge counts —
    * never a per-edge neighbor-set intersection, which a hub would blow
    * up quadratically. Output is the bounded 10-bucket Jaccard histogram
    * (micro div 1e5) — edge-scale rows stay distributed; only the
    * histogram returns. Exact throughout: counts are integers and the
    * micro ratio is DECIMAL-widened truncating division. */
  def q35NeighborJaccardLazy(s: SparkSession, d: String): (DataFrame, () => Unit) = {
    import s.implicits._
    val t = eth(s, "erc20")
      .select(least($"erc20_from", $"erc20_to").as("a"),
              greatest($"erc20_from", $"erc20_to").as("b"))
      .filter($"a" =!= $"b").distinct()
    val und = graft.plans.Caching.iterCheckpoint(t)
    // deg is consumed repeatedly (both orientation joins + downstream
    // aggregates); lineage-cut so the union+aggregate runs once (r12
    // quiet profile: the recomputes were roughly half the query's wall
    // time; the r14 probe then measured the eager localCheckpoint beating
    // the lazy persist's columnar cache on every read-back)
    val deg = graft.plans.Caching.iterCheckpoint(
      und.select($"a".as("n")).union(und.select($"b".as("n")))
        .groupBy($"n").agg(count(lit(1)).as("deg")))
    val withDeg = und
      .join(deg.withColumnRenamed("n", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("n", "b").withColumnRenamed("deg", "db"), "b")
    val oriented = graft.plans.Caching.iterCheckpoint(withDeg.select(
        when($"da" < $"db" || ($"da" === $"db" && $"a" < $"b"),
             struct($"a".as("src"), $"b".as("dst"), $"db".as("dd")))
          .otherwise(struct($"b".as("src"), $"a".as("dst"), $"da".as("dd")))
          .as("e"))
      .select($"e.src", $"e.dst", $"e.dd"))
    val e1 = oriented.select($"src", $"dst".as("v"), $"dd".as("dv"))
    val e2 = oriented.select($"src", $"dst".as("w"), $"dd".as("dw"))
    val tri = e1.join(e2, Seq("src"))
      .filter($"dv" < $"dw" || ($"dv" === $"dw" && $"v" < $"w"))
      .join(oriented.select($"src".as("v"), $"dst".as("w")), Seq("v", "w"))
    val triEdges = tri.select(explode(array(
        struct(least($"src", $"v").as("ea"), greatest($"src", $"v").as("eb")),
        struct(least($"src", $"w").as("ea"), greatest($"src", $"w").as("eb")),
        struct(least($"v", $"w").as("ea"), greatest($"v", $"w").as("eb")))).as("e"))
      .select($"e.ea".as("a"), $"e.eb".as("b"))
    val common = triEdges.groupBy($"a", $"b").agg(count(lit(1)).as("cm"))
    val perEdge = withDeg
      .join(common, Seq("a", "b"), "left")
      .select($"da", $"db", coalesce($"cm", lit(0L)).as("common"))
      .select($"common",
        expr("CAST(1000000 * CAST(common AS DECIMAL(38,0)) div (da + db - common) AS BIGINT)")
          .as("jacc_micro"))
    val out = perEdge
      .groupBy(expr("jacc_micro div 100000").as("bucket"))
      .agg(count(lit(1)).as("n_edges"), sum($"common").as("n_common"),
           max($"jacc_micro").as("max_jacc_micro"))
      .orderBy($"bucket")
    (out, () => {
      graft.plans.Caching.freeCheckpoint(und)
      graft.plans.Caching.freeCheckpoint(deg)
      graft.plans.Caching.freeCheckpoint(oriented)
    })
  }

  def q35NeighborJaccard(s: SparkSession, d: String): DataFrame = {
    val (out, free) = q35NeighborJaccardLazy(s, d)
    graft.plans.Caching.detach(out, free)
  }

  /** K-core peel rounds both engines execute for [[q37KCore]]. The
    * operator's SEMANTICS are "peel at most this many rounds": the Spark
    * side early-exits at the fixpoint (peeling is monotone — once no edge
    * drops, further rounds are identity), the oracle unrolls exactly this
    * many CTE rounds, and because extra rounds past the fixpoint are
    * no-ops the two agree at every scale whether or not the graph
    * converges within the cap. Convergence is logged, not asserted
    * (GraphSpec pins that the fixture converges well inside the cap). */
  private[graft] val KCoreRounds = 12
  private[graft] val KCoreK = 3

  /** Q37: k-core decomposition (k=3) of each token's transfer subgraph —
    * the community-density screen token analytics run after [[q19Components]]
    * ("who is in the densely-trading core, not just connected"): iteratively
    * peel nodes of degree < k until fixpoint; report per-token core size,
    * edge count and degree extremes.
    *
    * Scale shape: each round is ONE degree aggregate over the surviving
    * directed edge list plus two left-semi joins back to it — all
    * key-partitioned on (token, addr), no payload wider than two words in
    * any shuffle, no collect. Rounds are data-dependent but bounded by
    * [[KCoreRounds]]; per-round frames persist MEMORY_AND_DISK and the
    * previous round unpersists as soon as the next materializes, so peak
    * footprint is two edge frames however many rounds run (the q17/q19
    * iterative-state discipline). At 100 TB the peel is the standard
    * distributed k-core: round count in practice is small (degeneracy
    * ordering collapses quickly), and a capped round budget is exactly how
    * production graph engines bound the tail. */
  def q37KCoreLazy(s: SparkSession, d: String): (DataFrame, () => Unit) = {
    import s.implicits._
    val und = eth(s, "erc20")
      .select($"erc20_token".as("token"),
              least($"erc20_from", $"erc20_to").as("a"),
              greatest($"erc20_from", $"erc20_to").as("b"))
      .filter($"a" =!= $"b").distinct()
    // per-round state crosses rounds through iterCheckpoint, NOT a plain
    // persist: a persisted frame still nests every prior round's logical
    // plan, so analysis/optimization work grows per round and dominated
    // the wall clock (measured 40.7s quiet; the lineage cut took the same
    // peel to 2.1s — the q17/q19 iterative-state lesson, relearned)
    var cur = graft.plans.Caching.iterCheckpoint(
      und.select($"token", $"a".as("u"), $"b".as("v"))
        .union(und.select($"token", $"b".as("u"), $"a".as("v"))))
    var curCnt = cur.count()
    var rounds = 0
    var converged = false
    while (!converged && rounds < KCoreRounds) {
      val keep = cur.groupBy($"token", $"u")
        .agg(count(lit(1)).as("deg"))
        .filter($"deg" >= KCoreK)
        .select($"token", $"u")
      val next = graft.plans.Caching.iterCheckpoint(cur
        .join(keep, Seq("token", "u"), "left_semi")
        .join(keep.withColumnRenamed("u", "v"), Seq("token", "v"), "left_semi")
        .select($"token", $"u", $"v"))
      val nextCnt = next.count()
      graft.plans.Caching.freeCheckpoint(cur)
      converged = nextCnt == curCnt
      cur = next; curCnt = nextCnt; rounds += 1
    }
    System.err.println(s"[graft] eth_q37 k-core: " +
      (if (converged) s"fixpoint after $rounds rounds" else s"round cap $KCoreRounds hit"))
    val fin = cur
    val fdeg = fin.groupBy($"token", $"u").agg(count(lit(1)).as("deg"))
    val out = fin.join(fdeg, Seq("token", "u"))
      .groupBy($"token")
      .agg(countDistinct($"u").as("core_nodes"),
           expr("count(1) div 2").as("core_edges"),
           max($"deg").as("max_core_deg"),
           min($"deg").as("min_core_deg"))
      .orderBy($"token")
    (out, () => { graft.plans.Caching.freeCheckpoint(fin) })
  }

  def q37KCore(s: SparkSession, d: String): DataFrame = {
    val (out, free) = q37KCoreLazy(s, d)
    graft.plans.Caching.detach(out, free)
  }

  /** Connected components of the token-partitioned transfer graph via
    * the shared alternating large-star/small-star contraction —
    * see [[Graph.starComponents]] for the algorithm, the log-round bound,
    * and the fail-loud cap contract. Labels are the component MINIMUM
    * address, identical to what the replaced O(diameter) min-label
    * propagation converged to, so downstream aggregates and oracle
    * hashes are unchanged. */
  private[graft] def starComponents(sym: DataFrame, nodes: DataFrame,
      maxRounds: Int = 1000): (DataFrame, Int) =
    Graph.starComponents(sym, nodes, maxRounds)

  /** Weakly-connected components of each token's transfer subgraph —
    * "which addresses form one trading community per token" — via the
    * hybrid [[Graph.componentsLazy]]: driver union-find below the edge
    * threshold (the fixture/transfer case), [[starComponents]]-style
    * log-round contraction beyond it. The oracle computes TRUE
    * components independently (DuckDB recursive transitive closure), so
    * a hash match proves the chosen path actually converged —
    * deliberately asymmetric implementations. Output is the per-token community
    * summary: node/component counts + largest and smallest community
    * sizes. */
  def q19ComponentsLazy(s: SparkSession, d: String): (DataFrame, () => Unit) = {
    import s.implicits._
    val und = eth(s, "erc20")
      .select($"erc20_token".as("token"),
              least($"erc20_from", $"erc20_to").as("a"),
              greatest($"erc20_from", $"erc20_to").as("b"))
      .filter($"a" =!= $"b").distinct()
    val sym = graft.plans.Caching.iterCheckpoint(
      und.select($"token", $"a".as("u"), $"b".as("v"))
        .union(und.select($"token", $"b".as("u"), $"a".as("v"))))
    val nodes = graft.plans.Caching.iterCheckpoint(
      sym.select($"token", $"u".as("addr")).distinct())
    // hybrid: driver union-find when the deduped edge list is metadata-
    // scale (one job, no per-round convergence actions — the star loop's
    // fixed ~3 actions/round constant dominated the fixture wall), star
    // contraction beyond the threshold; identical labels either way
    // (GraphSpec path-equality test)
    val (lbl, rounds, freeStar) = Graph.componentsLazy(sym, nodes)
    System.err.println(s"[graft] eth_q19 components: " +
      (if (rounds == 0) "driver union-find path"
       else s"star contraction converged after $rounds changing rounds"))
    val comp = lbl.groupBy($"token", $"lbl").agg(count(lit(1)).as("sz"))
    val out = comp.groupBy($"token")
      .agg(sum($"sz").as("n_nodes"),
           count(lit(1)).as("n_components"),
           max($"sz").as("largest"),
           min($"sz").as("smallest"))
      .orderBy($"token")
    (out, () => {
      freeStar()
      graft.plans.Caching.freeCheckpoint(sym)
      graft.plans.Caching.freeCheckpoint(nodes)
    })
  }

  def q19Components(s: SparkSession, d: String): DataFrame = {
    val (out, free) = q19ComponentsLazy(s, d)
    graft.plans.Caching.detach(out, free)
  }

  /** Q20: per-(token, holder) NET BALANCE snapshot from the transfer log —
    * the "current holder table" every token-analytics dashboard derives
    * from the reference's ERC-20 decode (`EthereumERC20Utils.java:6-14`):
    * credit `erc20_to`, debit `erc20_from`, report the top-15 balances.
    * Balances ride the `weiDecimal` exact DECIMAL(38,0) scan — the
    * fixture plants uint256 values beyond 2^53 (above the double path's
    * precision and past long·100 range, caught by the first cents-based
    * draft of this query), so the +/− cancellation inside a balance is
    * only order-free in exact decimals. Output pinned as STRING per the
    * eth_q12 canonicalization rule.
    *
    * Scale shape: the signed ledger is a map-side projection union of the
    * one decode scan, one (token, addr) partial-agg'd shuffle, and a
    * TakeOrderedAndProject top-15 — at 100 TB of transfers this is the
    * minimum possible movement: every row contributes exactly two ledger
    * entries. */
  def q20Balances(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = EthFixtures.ensure(s)
    val t = s.read.format("ethereum").option("table", "erc20")
      .option("chain", dir).option("weiDecimal", "true").load()
      .select($"erc20_token".as("token"), $"erc20_from".as("from_a"),
              $"erc20_to".as("to_a"), $"erc20_value".as("wei"))
    // both ledger legs explode out of ONE decode scan (a union of two
    // selects executes the ERC-20 decode twice — at chain scale a second
    // full fetch+decode pass)
    val ledger = t.select($"token", explode(array(
        struct($"to_a".as("addr"), $"wei".as("wei"),
               lit(1L).as("n_in"), lit(0L).as("n_out")),
        struct($"from_a".as("addr"), (-$"wei").as("wei"),
               lit(0L).as("n_in"), lit(1L).as("n_out")))).as("e"))
      .select($"token", $"e.addr".as("addr"), $"e.wei".as("wei"),
              $"e.n_in".as("n_in"), $"e.n_out".as("n_out"))
    ledger.groupBy($"token", $"addr")
      .agg(sum($"wei").cast("decimal(38,0)").as("bal"),
           sum($"n_in").as("n_in"), sum($"n_out").as("n_out"))
      .orderBy($"bal".desc, $"token", $"addr")
      .limit(15)
      .select($"token", $"addr", $"bal".cast("string").as("balance_wei"),
              $"n_in", $"n_out")
  }

  /** Q21: time-span summary of a block range — the "how long did these
    * blocks take" dashboard primitive. Every aggregate here is FULLY
    * PUSHED into the source (`SupportsPushDownAggregates`): count and
    * min/max(block_number) are answered from range metadata, and
    * min/max(block_timestamp) exploits the chain's monotone timestamps —
    * `timestampOf(range endpoint)`, two point fetches. The whole query
    * plans ONE metadata partition and fetches ZERO full blocks
    * (EthPlanSpec asserts both), where the reference scans every block
    * in the range. */
  def q21TimeSpan(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    eth(s, "block")
      .filter($"block_number".between(1000, 4500))
      .agg(count(lit(1)).as("n_blocks"),
           min($"block_number").as("first_block"),
           max($"block_number").as("last_block"),
           min($"block_timestamp").as("first_ts"),
           max($"block_timestamp").as("last_ts"))
  }

  /** Deterministic BFS REACHABILITY to convergence: expand `seeds(token,
    * addr)` along directed `edges(token, src, dst)` until a round adds no
    * new address. Returns the reached set (seeds included).
    *
    * Convergence-guarded like [[starComponents]]: the loop stops on an
    * EMPTY frontier, not a fixed hop budget, so a transfer chain longer
    * than any preset depth still closes (the oracle computes true
    * closure via DuckDB's recursive fixed point — deliberately
    * asymmetric, so a hash match proves this loop converged). Hitting
    * `maxRounds` THROWS instead of returning a partially-tainted set —
    * DIRECTED reachability, unlike undirected components, has no known
    * shuffle-bounded log-round algorithm (path-doubling squares the edge
    * relation toward the O(n²) transitive closure), so BFS rounds =
    * seed-set eccentricity is the honest cost and a capped exit must
    * fail loud, never silently under-taint.
    *
    * Scale mitigation knob (OPT-IN): taint can never leave the UNDIRECTED
    * component of a seed, so when the edge list exceeds
    * `spark.graft.taintPruneEdges` (default: off) the loop first runs the
    * log-round [[starComponents]] contraction and restricts the edge list
    * to seed-containing components — semantics-preserving (GraphScale
    * asserts pruned ≡ unpruned). It is opt-in because it is NOT free:
    * the contraction itself costs ~2·log₂(n) edge-scale rounds up front
    * (measured 18.6s pruned vs 6.1s unpruned on a 1M-node/1.4M-edge
    * shallow community graph — the prune only pays when the BFS is DEEP
    * or the per-round join against the full edge list dominates, i.e.
    * seed components are a sliver of an enormous corpus). Default-off
    * keeps the fixture plan at its round-10 fingerprint.
    *
    * Scale shape: per-round work is one equi-join of the (shrinking)
    * frontier against the edge list on (token, src), a distinct, and an
    * anti-join against the |V|-bounded reached set — all hash shuffles of
    * node-scale data; rounds needed = max seed-set eccentricity within
    * seed components. Lineage is truncated per round
    * ([[graft.plans.Caching.iterCheckpoint]]; reliable-checkpoint mode
    * available for clusters). */
  private[graft] def reachFrom(edges0: DataFrame, seeds: DataFrame,
      maxRounds: Int = 10000): DataFrame = {
    val s = edges0.sparkSession
    import s.implicits._
    val pruneAt = s.conf.getOption("spark.graft.taintPruneEdges")
      .map(_.toLong).getOrElse(Long.MaxValue)
    // Spark constraint-rewrite hazard (hit at 1M in GraphScale, absent at
    // fixture scale): checkpointing the union of two ALREADY-CHECKPOINTED
    // frames can throw `key not found: <attr>` inside
    // LogicalRDD.fromDataset → Union.rewriteConstraints — a checkpointed
    // LogicalRDD's carried-over constraints can reference attributes
    // outside its own output after enough accumulation rounds (identity
    // Projects don't help: the optimizer collapses them before
    // fromDataset reads the optimized plan's constraints). Constraint
    // propagation is an optional optimization the BFS loop gets nothing
    // from, so it is switched off for the duration of the loop and
    // restored after; frames built inside the window carry empty
    // constraint sets, so later consumers are unaffected.
    val cpKey = "spark.sql.constraintPropagation.enabled"
    val cpOld = s.conf.getOption(cpKey)
    s.conf.set(cpKey, "false")
    try {
    val edges =
      if (edges0.count() <= pruneAt) edges0
      else {
        val sym = edges0.select($"token", $"src".as("u"), $"dst".as("v"))
          .union(edges0.select($"token", $"dst".as("u"), $"src".as("v")))
        val nodes = sym.select($"token", $"u".as("addr")).distinct()
        val (lbl, _, freeStar) = Graph.componentsLazy(sym, nodes)
        val seedLbls = lbl.join(seeds.select($"token", $"addr"),
            Seq("token", "addr"), "left_semi")
          .select($"token", $"lbl").distinct()
        val keepNodes = lbl.join(seedLbls, Seq("token", "lbl"), "left_semi")
          .select($"token", $"addr".as("src"))
        val pruned = graft.plans.Caching.iterCheckpoint(
          edges0.join(keepNodes, Seq("token", "src"), "left_semi"))
        freeStar() // pruned edges are materialized; the star is consumed
        pruned
      }
    var reached = graft.plans.Caching.iterCheckpoint(seeds.select($"token", $"addr"))
    var frontier = reached
    var rounds = 0
    var n = frontier.count()
    while (n > 0) {
      if (rounds >= maxRounds)
        throw new IllegalStateException(
          s"reachFrom frontier still non-empty after $maxRounds rounds — " +
          "refusing to return an under-tainted set; raise maxRounds")
      val next = frontier.as("r")
        .join(edges.as("e"), $"r.token" === $"e.token" && $"r.addr" === $"e.src")
        .select($"e.token".as("token"), $"e.dst".as("addr")).distinct()
        .join(reached, Seq("token", "addr"), "left_anti")
      val prevFrontier = frontier
      frontier = graft.plans.Caching.iterCheckpoint(next)
      n = frontier.count()
      // the previous frontier is superseded once the new one (which read
      // it) is materialized; never free the live `reached` alias
      if (!(prevFrontier eq reached))
        graft.plans.Caching.freeCheckpoint(prevFrontier)
      if (n > 0) {
        val prevReached = reached
        reached = graft.plans.Caching.iterCheckpoint(reached.union(frontier))
        graft.plans.Caching.freeCheckpoint(prevReached)
        rounds += 1
      }
    }
    if (!(frontier eq reached)) graft.plans.Caching.freeCheckpoint(frontier)
    reached
    } finally {
      cpOld match {
        case Some(v) => s.conf.set(cpKey, v)
        case None => s.conf.unset(cpKey)
      }
    }
  }

  /** Q22: taint tracing — the flow-of-funds question every chain-forensics
    * desk asks of the reference's data ("which addresses ever received
    * value, directly or through intermediaries, from this seed set"):
    * seeds are the addresses that SENT a transfer in the first 300 blocks;
    * taint propagates along directed transfer edges to a fixed point via
    * [[reachFrom]]. Per token: graph size, tainted-address count, and the
    * count + EXACT total wei (DECIMAL(38,0) over the `weiDecimal` scan —
    * the fixture plants >2^64 uint256 values) of transfers sent by
    * tainted addresses, string-pinned per the eth_q12 rule.
    *
    * Scale shape: the transfer scan feeds a distinct edge list (node²-
    * bounded, transfer-deduped) and the BFS state is |V| rows; the value
    * rollup is one (token) aggregate over a hash semi-join of transfers
    * against the bounded tainted set. Nothing driver-side. */
  def q22TaintLazy(s: SparkSession, d: String): (DataFrame, () => Unit) = {
    import s.implicits._
    val dir = EthFixtures.ensure(s)
    val x = s.read.format("ethereum").option("table", "erc20")
      .option("chain", dir).option("weiDecimal", "true").load()
      .select($"erc20_token".as("token"), $"erc20_from".as("f"),
              $"erc20_to".as("t"), $"erc20_value".as("wei"),
              $"erc20_blockNumber".as("bn"))
    val edges = graft.plans.Caching.iterCheckpoint(x.filter($"f" =!= $"t")
      .select($"token", $"f".as("src"), $"t".as("dst")).distinct())
    val seeds = x.filter($"bn" <= 300 && $"f" =!= $"t")
      .select($"token", $"f".as("addr")).distinct()
    val reached = reachFrom(edges, seeds)
    val nodes = edges.select($"token", $"src".as("addr"))
      .union(edges.select($"token", $"dst".as("addr"))).distinct()
    val summ = nodes.join(reached.withColumn("tainted", lit(1L)),
        Seq("token", "addr"), "left")
      .groupBy($"token")
      .agg(count(lit(1)).as("n_addrs"),
           coalesce(sum($"tainted"), lit(0L)).as("n_tainted"))
    val tv = x.join(reached.withColumnRenamed("addr", "f"), Seq("token", "f"))
      .groupBy($"token")
      .agg(count(lit(1)).as("n_tainted_transfers"),
           sum($"wei").cast("decimal(38,0)").cast("string").as("tainted_value_wei"))
    val out = summ.join(tv, Seq("token"))
      .select($"token", $"n_addrs", $"n_tainted", $"n_tainted_transfers",
              $"tainted_value_wei")
      .orderBy($"token")
    (out, () => graft.plans.Caching.freeCheckpoint(edges))
  }

  def q22Taint(s: SparkSession, d: String): DataFrame = {
    val (out, free) = q22TaintLazy(s, d)
    graft.plans.Caching.detach(out, free)
  }

  /** Q23: sender-concentration profile per token — Gini coefficient, HHI,
    * and top-holder share over per-address OUTGOING transfer counts: the
    * "is this token's activity organic or one whale" screen. All three
    * statistics are EXACT INTEGER micro-units (the repo's standing
    * discipline): with counts c₁ ≤ … ≤ cₙ ranked ascending (ties broken
    * by address) and S = Σc,
    *
    *   gini_micro = (2·Σ i·cᵢ − (n+1)·S)·10⁶ div (n·S)      (≥ 0 by the
    *     Chebyshev sum inequality, so Spark's truncating `div` and
    *     DuckDB's flooring `//` agree)
    *   hhi_micro  = Σ cᵢ²·10⁶ div S²,  top_share_micro = max(c)·10⁶ div S.
    *
    * Products widen to DECIMAL(38,0)/HUGEINT before the divide: at 1e9
    * addresses with 1e10-transfer hubs, Σ i·cᵢ reaches ~1e28 — past long
    * range, within 38 digits.
    *
    * Scale shape: one (token, addr) count shuffle, then the ascending
    * rank `i` via [[graft.plans.ScalableNtile.groupedRank]] — the
    * round-8 review flagged the per-token `row_number` window here: its
    * partition is a token's ENTIRE holder set, node-scale for a hub
    * token even though the frame is already aggregated. groupedRank
    * range-partitions the composite (token, c, addr) key instead, so a
    * hub token's holders rank across many tasks (bit-identical — the
    * key is a total order; EthAnalyticsSpec proves equality with the
    * window form). The counts frame persists for groupedRank's
    * boundary-sample + rank passes and detaches after materialization. */
  def q23Gini(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = graft.plans.Caching.iterCheckpoint(eth(s, "erc20")
      .groupBy($"erc20_token".as("token"), $"erc20_from".as("addr"))
      .agg(count(lit(1)).as("c")))
    val out = graft.plans.ScalableNtile.groupedRank(
        c, Seq("token"), Seq($"c", $"addr"), "i")
      .groupBy($"token")
      .agg(count(lit(1)).as("n_senders"),
           sum($"c").as("s"),
           sum($"c".cast("decimal(38,0)") * $"i").as("sic"),
           sum($"c".cast("decimal(38,0)") * $"c").as("ssq"),
           max($"c").as("cmax"))
      .select($"token", $"n_senders", $"s".as("n_transfers"),
        expr("""CAST((2 * sic - (n_senders + 1) * CAST(s AS DECIMAL(38,0))) * 1000000
                div (CAST(n_senders AS DECIMAL(38,0)) * s) AS BIGINT)""").as("gini_micro"),
        expr("CAST(ssq * 1000000 div (CAST(s AS DECIMAL(38,0)) * s) AS BIGINT)").as("hhi_micro"),
        expr("CAST(CAST(cmax AS DECIMAL(38,0)) * 1000000 div s AS BIGINT)").as("top_share_micro"))
      .orderBy($"token")
    graft.plans.Caching.detach(out, () => graft.plans.Caching.freeCheckpoint(c))
  }

  /** Q24: nonce-sequence audit over the transaction table — the
    * account-integrity screen a chain indexer runs after ingest: a sane
    * account's nonces are the contiguous sequence 0..n-1, so per-sender
    * `n_tx ≠ distinct(nonce)` flags REUSE (replaced/re-broadcast
    * transactions) and `max−min+1 ≠ distinct` flags GAPS (missed blocks
    * in the ingest range). One (sender) aggregate with a count-distinct
    * expansion, then a single summary row — no windows, no joins; at
    * 100 TB this is a textbook two-phase hash aggregate. */
  def q24NonceAudit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    eth(s, "transaction")
      .groupBy($"tx_from")
      .agg(count(lit(1)).as("n_tx"), min($"tx_nonce").as("mn"),
           max($"tx_nonce").as("mx"), countDistinct($"tx_nonce").as("nd"))
      .agg(count(lit(1)).as("n_addrs"),
           sum($"n_tx").as("n_tx"),
           sum(when($"n_tx" =!= $"nd", 1L).otherwise(0L)).as("n_with_reused"),
           sum(when($"mx" - $"mn" + 1L =!= $"nd", 1L).otherwise(0L)).as("n_with_gaps"),
           sum($"n_tx" - $"nd").as("n_reused_total"),
           sum($"mx" - $"mn" + lit(1L) - $"nd").as("n_missing_total"))
  }

  /** Q25: gas-market dashboard — per-1000-block bucket, exact integer
    * gas-price percentiles (p50/p90/max in gwei) plus the bucket's total
    * fee budget in exact wei. The gas-price domain is integral gwei
    * (tiny), so the percentile is a HISTOGRAM READ-OFF (the
    * nd_events_percentiles discipline): one (bucket, gwei) hash aggregate
    * — map-side partial, cells bounded by buckets × gwei domain — a
    * per-bucket cumulative window over the ALREADY-AGGREGATED cells, and
    * one final aggregate. Nothing data-scale is sorted globally and no
    * exact-`percentile` single-buffer aggregate appears. The fee product
    * gas×gasPrice is widened to LONG before multiplying (≤ ~5.3e16 <
    * 2^63 — a double product would round past 2^53) and summed in
    * DECIMAL(38,0), so bucket totals are exact at any scale. */
  def q25GasMarket(s: SparkSession, d: String): DataFrame =
    q25GasMarketOf(eth(s, "transaction"))

  /** [[q25GasMarket]] over any transaction-shaped frame. */
  def q25GasMarketOf(txFrame: DataFrame): DataFrame = {
    val s = txFrame.sparkSession
    import s.implicits._
    val tx = txFrame
      .select(expr("tx_blockNumber div 1000").as("blk_k"),
              expr("CAST(tx_gasPrice AS BIGINT) div 1000000000").as("gwei"),
              ($"tx_gas".cast("long") * $"tx_gasPrice".cast("long")).as("fee"))
    val hist = tx.groupBy($"blk_k", $"gwei")
      .agg(count(lit(1)).as("n"), sum($"fee".cast("decimal(38,0)")).as("fee_w"))
    // bucket totals come from a SECOND window over the same tiny cell
    // frame (one shuffle, reused partitioning) — NOT a second aggregate
    // of the source, which would re-scan the chain
    val w = Window.partitionBy($"blk_k").orderBy($"gwei")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.withColumn("cum", sum($"n").over(w))
      .withColumn("nt", sum($"n").over(Window.partitionBy($"blk_k")))
      .groupBy($"blk_k")
      .agg(max($"nt").as("n_tx"),
           min(when($"cum" * 100 >= $"nt" * 50, $"gwei")).as("p50_gwei"),
           min(when($"cum" * 100 >= $"nt" * 90, $"gwei")).as("p90_gwei"),
           max($"gwei").as("max_gwei"),
           sum($"fee_w").cast("decimal(38,0)").cast("string").as("fee_wei"))
      .orderBy($"blk_k")
  }

  /** Q26: address-cohort retention — the on-chain analogue of product
    * retention: cohort an address by the 1000-block bucket of its FIRST
    * transaction, then count how many of each cohort are still active
    * `age_k` buckets later. Shape: one (addr) min-aggregate for first-seen,
    * one DISTINCT (addr, bucket) activity set, an addr-keyed equi-join
    * between the two (both sides already address-scale, far smaller than
    * the transaction scan), and a final (cohort, age) aggregate whose
    * output is buckets² rows. At 100 TB every stage is a partial-agg'd
    * hash shuffle on the address key — no windows, no skew funnel (the
    * join key is the address, not the cohort). */
  def q26AddressCohorts(s: SparkSession, d: String): DataFrame =
    q26AddressCohortsOf(eth(s, "transaction"))

  /** [[q26AddressCohorts]] over any transaction-shaped frame. */
  def q26AddressCohortsOf(txFrame: DataFrame): DataFrame = {
    val s = txFrame.sparkSession
    import s.implicits._
    val tx = txFrame
      .select($"tx_from".as("addr"), expr("tx_blockNumber div 1000").as("k"))
    // first-seen rides a min-window over the ALREADY-DISTINCT activity
    // set (address-partitioned, address-scale rows) — one chain scan,
    // not a separate first-seen aggregate that scans the source again
    tx.distinct()
      .withColumn("cohort_k", min($"k").over(Window.partitionBy($"addr")))
      .groupBy($"cohort_k", ($"k" - $"cohort_k").as("age_k"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy($"cohort_k", $"age_k")
  }

  /** Q27: uncle economics per miner — uncle production rate as a miner
    * quality signal (high uncle rates historically meant poor network
    * position). Exercises the `block_uncles` array column straight off
    * the columnar scan (`size` is codegen'd over the array vector). One
    * hash aggregate to miner-scale rows; the rate is exact integer
    * micro-units (long arithmetic — counts × 1e6 cannot overflow). */
  def q27UncleEconomics(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    eth(s, "block")
      .select($"block_miner", size($"block_uncles").cast("long").as("nu"))
      .groupBy($"block_miner")
      .agg(count(lit(1)).as("n_blocks"),
           sum($"nu").as("n_uncles"),
           sum(when($"nu" > 0L, 1L).otherwise(0L)).as("blocks_with_uncles"))
      .select($"block_miner", $"n_blocks", $"n_uncles", $"blocks_with_uncles",
              expr("n_uncles * 1000000 div n_blocks").as("uncle_rate_micro"))
      .orderBy($"n_blocks".desc, $"block_miner")
  }

  /** Q28: whale screen — top addresses by NET ether flow with gross
    * volume and counterparty breadth, in exact wei. Reads the transaction
    * table in `weiDecimal` mode (DECIMAL(38,0) value path, the
    * eth_q13-proven exact lane), unions an outflow ledger (negated) with
    * an inflow ledger, and runs ONE address-keyed aggregate with a
    * distinct-counterparty expansion; the top-20 is a TakeOrdered, not a
    * global sort. Net/gross are emitted as strings so the driver compare
    * is digit-exact against DuckDB's DECIMAL formatting. 100 TB: the
    * union is scan-fused (no materialization), the aggregate partial-
    * combines map-side, and nothing beyond 20 rows reaches the driver. */
  def q28EthFlow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = EthFixtures.ensure(s)
    val t = s.read.format("ethereum").option("table", "transaction")
      .option("chain", dir).option("weiDecimal", "true").load()
    // both ledger legs explode out of ONE scan (a union of two selects of
    // the same source executes the scan twice — at chain scale that is a
    // second full fetch); the inflow leg of a to-less contract creation
    // drops via the null-addr filter
    t.select(explode(array(
        struct($"tx_from".as("addr"), (-$"tx_value").as("wei"),
               lit(1L).as("n_out"), lit(0L).as("n_in"), $"tx_to".as("peer")),
        struct($"tx_to".as("addr"), $"tx_value".as("wei"),
               lit(0L).as("n_out"), lit(1L).as("n_in"), $"tx_from".as("peer"))))
        .as("e"))
      .select($"e.addr".as("addr"), $"e.wei".as("wei"), $"e.n_out".as("n_out"),
              $"e.n_in".as("n_in"), $"e.peer".as("peer"))
      .filter($"addr".isNotNull)
      .groupBy($"addr")
      .agg(sum($"wei").cast("decimal(38,0)").as("net"),
           sum(abs($"wei")).cast("decimal(38,0)").as("gross"),
           sum($"n_in").as("n_in"), sum($"n_out").as("n_out"),
           countDistinct($"peer").as("n_peers"))
      .orderBy($"net".desc, $"addr")
      .limit(20)
      .select($"addr", $"net".cast("string").as("net_wei"),
              $"gross".cast("string").as("gross_wei"),
              $"n_in", $"n_out", $"n_peers")
  }

  /** Q29: same-block bounce screen — addresses that RECEIVE ether and
    * SPEND in the very same block (classic mixer / peel-chain behavior;
    * with same-block granularity it is also the coarse MEV-bot signature).
    * One equi-join of the inbound leg against the outbound leg on
    * `(block, address)` — the join key carries the block, so co-activity
    * is matched without any window or per-block sort, and per-key fan-out
    * is bounded by one address's activity inside one block. Then one
    * address aggregate and a TakeOrdered top-20. */
  def q29BounceScreen(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val t = eth(s, "transaction")
    val paid = t.filter($"tx_to".isNotNull)
      .select($"tx_blockNumber".as("bn"), $"tx_to".as("addr"), $"tx_hash".as("h_in"))
    val spent = t.select($"tx_blockNumber".as("bn"), $"tx_from".as("addr"),
      $"tx_hash".as("h_out"))
    paid.join(spent, Seq("bn", "addr"))
      .filter($"h_in" =!= $"h_out")
      .groupBy($"addr")
      .agg(count(lit(1)).as("n_pairs"), countDistinct($"bn").as("n_blocks"))
      .orderBy($"n_pairs".desc, $"addr")
      .limit(20)
  }

  /** Q30: intra-block gas-price ordering audit — miners are expected to
    * order transactions by descending gas price, so an ASCENDING adjacent
    * pair is an ordering anomaly (at Ethereum scale, the bulk signal for
    * out-of-band inclusion deals). `lag` over a window PARTITIONED BY
    * BLOCK (hash-distributed, millions of tiny per-block frames — the
    * opposite of a single-partition funnel) feeds one bucket aggregate;
    * the anomaly rate is exact integer micro-units. */
  def q30GasOrderAudit(s: SparkSession, d: String): DataFrame =
    q30GasOrderAuditOf(eth(s, "transaction"))

  /** [[q30GasOrderAudit]] over any transaction-shaped frame. */
  def q30GasOrderAuditOf(txFrame: DataFrame): DataFrame = {
    val s = txFrame.sparkSession
    import s.implicits._
    val w = Window.partitionBy($"bn").orderBy($"idx")
    txFrame
      .select($"tx_blockNumber".as("bn"), $"tx_transactionIndex".as("idx"),
              expr("CAST(tx_gasPrice AS BIGINT)").as("gp"))
      .withColumn("prev_gp", lag($"gp", 1).over(w))
      .filter($"prev_gp".isNotNull)
      .groupBy(expr("bn div 1000").as("blk_k"))
      .agg(count(lit(1)).as("n_pairs"),
           sum(when($"gp" > $"prev_gp", 1L).otherwise(0L)).as("n_asc"))
      .select($"blk_k", $"n_pairs", $"n_asc",
              expr("n_asc * 1000000 div n_pairs").as("asc_rate_micro"))
      .orderBy($"blk_k")
  }

  /** Q31: chain-integrity audit over the difficulty columns — the
    * consistency screen an indexer runs after ingest: on a valid chain
    * `totalDifficulty[n] − totalDifficulty[n−1] = difficulty[n]`, so any
    * violating adjacent pair flags corrupt or reorged ingest. Adjacent
    * blocks pair via the eth_q1 consecutive-block EQUI-join (key =
    * block_number+1) — never a global-order window, which would funnel
    * the chain through one partition. Per-1000-block roll-up adds the
    * exact difficulty envelope; totalDifficulty is already long and sums
    * widen to DECIMAL(38,0) before the integral mean. Also the first
    * query to exercise `block_totalDifficulty` end-to-end (A2 column
    * coverage). */
  def q31ChainIntegrity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    q31ChainIntegrityOf(eth(s, "block")
      .select($"block_number", $"block_difficulty", $"block_totalDifficulty"))
  }

  /** [[q31ChainIntegrity]] over any block-shaped frame (planted-chain
    * specs use this to prove the violation path actually fires). */
  def q31ChainIntegrityOf(b: DataFrame): DataFrame = {
    val s = b.sparkSession
    import s.implicits._
    b.as("a").join(b.as("b"), col("b.block_number") === col("a.block_number") + 1)
      .select(expr("b.block_number div 1000").as("blk_k"),
              (col("b.block_totalDifficulty") - col("a.block_totalDifficulty") =!=
               col("b.block_difficulty")).as("viol"),
              col("b.block_difficulty").as("diff"))
      .groupBy($"blk_k")
      .agg(count(lit(1)).as("n_pairs"),
           sum(when($"viol", 1L).otherwise(0L)).as("n_td_violations"),
           min($"diff").as("min_difficulty"),
           max($"diff").as("max_difficulty"),
           expr("CAST(sum(CAST(diff AS DECIMAL(38,0))) div count(1) AS BIGINT)")
             .as("avg_difficulty"))
      .orderBy($"blk_k")
  }

  /** Q32: token ADOPTION curve — per token, new and cumulative receiving
    * addresses per 1000-block bucket. Cumulative-distinct is the classic
    * scale trap (a distinct-over-window recounts the full prefix per
    * row); the scale-true shape counts each address ONCE at its
    * first-seen bucket — one (token, addr) min-aggregate, one
    * (token, bucket) count — and the running sum is a window over the
    * ALREADY-AGGREGATED bucket-scale frame, partitioned per token. */
  def q32Adoption(s: SparkSession, d: String): DataFrame =
    q32AdoptionOf(eth(s, "erc20"))

  /** [[q32Adoption]] over any erc20-shaped frame. */
  def q32AdoptionOf(erc20Frame: DataFrame): DataFrame = {
    val s = erc20Frame.sparkSession
    import s.implicits._
    val firstSeen = erc20Frame
      .groupBy($"erc20_token".as("token"), $"erc20_to".as("addr"))
      .agg(min($"erc20_blockNumber").as("first_bn"))
    val perBucket = firstSeen
      .groupBy($"token", expr("first_bn div 1000").as("blk_k"))
      .agg(count(lit(1)).as("new_adopters"))
    val w = Window.partitionBy($"token").orderBy($"blk_k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket
      .withColumn("cum_adopters", sum($"new_adopters").over(w))
      .orderBy($"token", $"blk_k")
  }

  /** Q33: 4-byte function-SELECTOR profile — the contract-usage census
    * (which methods the chain actually calls): selector = the first four
    * calldata bytes (`substr(input, 1, 10)` over the 0x-hex string);
    * bare value transfers (`input = '0x'`) bucket separately. One hash
    * aggregate with a distinct-recipient expansion and exact integer gas
    * stats (DECIMAL-widened mean). First query to exercise `tx_input`
    * end-to-end (A2 column coverage). */
  def q33Selectors(s: SparkSession, d: String): DataFrame =
    q33SelectorsOf(eth(s, "transaction"))

  /** [[q33Selectors]] over any transaction-shaped frame. */
  def q33SelectorsOf(txFrame: DataFrame): DataFrame = {
    val s = txFrame.sparkSession
    import s.implicits._
    txFrame
      .select(when($"tx_input" === "0x", lit("(transfer)"))
                .otherwise(substring($"tx_input", 1, 10)).as("selector"),
              $"tx_to", $"tx_gas".cast("long").as("gas"))
      .groupBy($"selector")
      .agg(count(lit(1)).as("n_tx"),
           countDistinct($"tx_to").as("n_to"),
           sum($"gas").as("total_gas"),
           expr("CAST(sum(CAST(gas AS DECIMAL(38,0))) div count(1) AS BIGINT)")
             .as("avg_gas"))
      .orderBy($"n_tx".desc, $"selector")
  }

  /** Q34: transfer-VALUE distribution in exact power-of-two bins — the
    * "how big are payments" histogram, binned by BIT LENGTH of the wei
    * value (`length(bin(v))`, the nd_pipeline_length_batches discipline:
    * no float log2 boundary ambiguity; zero-value transfers bin
    * separately). tx values stay under 2^63 wei (~9.2e18; larger values
    * ride the weiDecimal lane elsewhere), so the long cast is exact.
    * One hash aggregate; bucket sums widen to DECIMAL(38,0)/HUGEINT and
    * pin as strings. */
  def q34ValueHistogram(s: SparkSession, d: String): DataFrame =
    q34ValueHistogramOf(eth(s, "transaction"))

  /** [[q34ValueHistogram]] over any transaction-shaped frame. */
  def q34ValueHistogramOf(txFrame: DataFrame): DataFrame = {
    val s = txFrame.sparkSession
    import s.implicits._
    txFrame
      .select($"tx_value".cast("long").as("v"))
      .select(when($"v" === 0L, lit(0L))
                .otherwise(length(bin($"v")).cast("long")).as("bits"))
      .groupBy($"bits")
      .agg(count(lit(1)).as("n_tx"))
      .withColumn("share_micro",
        expr("""CAST(CAST(n_tx AS DECIMAL(38,0)) * 1000000
                div sum(n_tx) OVER () AS BIGINT)"""))
      .orderBy($"bits")
  }

  /** B12: the catalog's DESCRIBE surface *as data*. The reference pins the
    * exact `DESCRIBE block/transaction/erc20` output in its docs
    * (`README.md:139-186`; widths `EthereumMetadata.java:48-51`), so this
    * query materializes `DESCRIBE ethereum.default.*` into rows
    * `(tbl, pos, col_name, data_type)` with Presto's type spellings
    * (`int`→`integer`, unbounded `string`→`varchar`,
    * `array<…>`→`array(…)`) and lower-cased identifiers, exactly as the
    * README prints them. The oracle is a hand-pinned VALUES literal of that
    * README table — a value-level golden check of A1/A2/B12, including
    * column order (`pos`) and every bounded-varchar width. Collecting the
    * DESCRIBE output driver-side is metadata-scale (35 rows). */
  def qDescribe(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = EthFixtures.ensure(s)
    s.conf.set("spark.sql.catalog.ethereum",
      classOf[graft.sources.eth.EthereumCatalog].getName)
    s.conf.set("spark.sql.catalog.ethereum.chain", dir)
    val rows = Seq("block", "transaction", "erc20").flatMap { t =>
      s.sql(s"DESCRIBE ethereum.default.$t").collect()
        .filter(r => r.getString(0).nonEmpty && !r.getString(0).startsWith("#"))
        .zipWithIndex.map { case (r, i) =>
          val presto = r.getString(1) match {
            case "int"    => "integer"
            case "string" => "varchar"
            case a if a.startsWith("array<") =>
              s"array(${a.stripPrefix("array<").stripSuffix(">")})"
            case other => other
          }
          (t, (i + 1).toLong, r.getString(0).toLowerCase, presto)
        }
    }
    rows.toDF("tbl", "pos", "col_name", "data_type").orderBy($"tbl", $"pos")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "eth_describe" -> qDescribe _,
    "eth_q1_blocktime" -> q1BlockTime _,
    "eth_q2_ntile_gas" -> q2NtileGas _,
    "eth_q3_top_miners" -> q3TopMiners _,
    "eth_q4_erc20_movement" -> q4Erc20Movement _,
    "eth_q5_fromwei" -> q5FromWei _,
    "eth_q6_ts_range" -> q6TsRange _,
    "eth_q7_hash_lookup" -> q7HashLookup _,
    "eth_q8_tx_per_miner" -> q8TxPerMiner _,
    "eth_q9_array_cols" -> q9ArrayCols _,
    "eth_udfs" -> qUdfs _,
    "eth_q10_ntile_scalable" -> q10NtileScalable _,
    "eth_q11_log_decode" -> q11LogDecode _,
    "eth_q12_wei_decimal" -> q12WeiDecimal _,
    "eth_q13_tx_decimal" -> q13TxDecimal _,
    "eth_q14_limit_scan" -> q14LimitScan _,
    "eth_q15_count_range" -> q15CountRange _,
    "eth_q16_token_graph" -> q16TokenGraph _,
    "eth_q17_pagerank" -> q17PageRank _,
    "eth_q18_triangles" -> q18Triangles _,
    "eth_q35_jaccard" -> q35NeighborJaccard _,
    "eth_q19_components" -> q19Components _,
    "eth_q20_balances" -> q20Balances _,
    "eth_q21_time_span" -> q21TimeSpan _,
    "eth_q22_taint" -> q22Taint _,
    "eth_q23_gini" -> q23Gini _,
    "eth_q24_nonce_audit" -> q24NonceAudit _,
    "eth_q25_gas_market" -> q25GasMarket _,
    "eth_q26_cohorts" -> q26AddressCohorts _,
    "eth_q27_uncles" -> q27UncleEconomics _,
    "eth_q28_eth_flow" -> q28EthFlow _,
    "eth_q29_bounce" -> q29BounceScreen _,
    "eth_q30_gas_order" -> q30GasOrderAudit _,
    "eth_q31_chain_integrity" -> q31ChainIntegrity _,
    "eth_q32_adoption" -> q32Adoption _,
    "eth_q33_selectors" -> q33Selectors _,
    "eth_q34_value_histogram" -> q34ValueHistogram _,
    "eth_q36_account_batch" -> q36AccountBatch _,
    "eth_q37_kcore" -> q37KCore _)

  /** Unrolled [[KCoreRounds]]-round k-core peel replay (see [[q37KCoreLazy]]
    * for why a fixed unroll equals the Spark side's early-exit loop at any
    * scale): each round keeps the directed edges whose BOTH endpoints still
    * have degree ≥ k in the previous round's edge set. Purely integer,
    * bit-exact. Every round CTE is `AS MATERIALIZED`: DuckDB 1.0 inlines
    * plain CTEs per reference, and each round references its predecessor
    * three times, so the un-materialized unroll expands 3^rounds re-reads
    * of the erc20 parquet (measured: rounds past 6 never return and the
    * reader eventually reports a spurious no-files-found under fd
    * pressure). Materialization makes the replay linear in rounds. */
  private val kcoreOracle: String = {
    val k = KCoreK
    val head =
      """, e0 AS MATERIALIZED (
           SELECT erc20_token AS token, erc20_from AS u, erc20_to AS v
           FROM erc20 WHERE erc20_from <> erc20_to
           UNION
           SELECT erc20_token, erc20_to, erc20_from
           FROM erc20 WHERE erc20_from <> erc20_to)"""
    val steps = (1 to KCoreRounds).map { i =>
      s""", d${i - 1} AS MATERIALIZED (SELECT token, u FROM e${i - 1}
               GROUP BY token, u HAVING count(*) >= $k),
          e$i AS MATERIALIZED (SELECT e.token, e.u, e.v FROM e${i - 1} e
               JOIN d${i - 1} x ON e.token = x.token AND e.u = x.u
               JOIN d${i - 1} y ON e.token = y.token AND e.v = y.u)"""
    }.mkString
    val tail =
      s""", fd AS (SELECT token, u, count(*) AS deg
                   FROM e$KCoreRounds GROUP BY token, u)
         SELECT e.token,
                CAST(count(DISTINCT e.u) AS BIGINT) AS core_nodes,
                CAST(count(*) // 2 AS BIGINT) AS core_edges,
                CAST(max(fd.deg) AS BIGINT) AS max_core_deg,
                CAST(min(fd.deg) AS BIGINT) AS min_core_deg
         FROM e$KCoreRounds e JOIN fd ON e.token = fd.token AND e.u = fd.u
         GROUP BY e.token ORDER BY e.token"""
    head + steps + tail
  }

  /** Unrolled 5-iteration integer PageRank replay (see [[q17PageRank]] for
    * the exact recurrence); starts with "," to extend [[withEthTables]]'s
    * CTE list. DuckDB's `//` and Spark's `div` agree on positive integers,
    * and every value in the recurrence is a positive integer, so the replay
    * is bit-exact. */
  private val pageRankOracle: String = {
    val base =
      """, edges AS (SELECT erc20_from AS src, erc20_to AS dst, count(*) AS w
                     FROM erc20 GROUP BY 1, 2),
         outw AS (SELECT src, sum(w) AS tw FROM edges GROUP BY src),
         wedges AS (SELECT e.src, e.dst, e.w, CAST(o.tw AS BIGINT) AS tw
                    FROM edges e JOIN outw o ON e.src = o.src),
         nodes AS (SELECT src AS addr FROM edges UNION SELECT dst AS addr FROM edges),
         pr0 AS (SELECT addr, CAST(1000000 AS BIGINT) AS r FROM nodes)"""
    // products widen to HUGEINT before the floor divide, mirroring the
    // Spark side's DECIMAL(38,0) widening (plain BIGINT r·w wraps at a
    // 1e9-address scale — and the engines would even disagree: Spark
    // wraps, DuckDB raises)
    val iters = (1 to 5).map { i =>
      s"""pr$i AS (SELECT n.addr,
             CAST(150000 + (850 * CAST(COALESCE(c.s, 0) AS HUGEINT)) // 1000 AS BIGINT) AS r
           FROM nodes n LEFT JOIN (
             SELECT e.dst, CAST(sum((CAST(p.r AS HUGEINT) * e.w) // e.tw) AS BIGINT) AS s
             FROM wedges e JOIN pr${i - 1} p ON e.src = p.addr
             GROUP BY e.dst) c ON n.addr = c.dst)"""
    }.mkString(",\n")
    s"""$base,
       $iters
       SELECT addr, r AS rank_micro FROM pr5 ORDER BY r DESC, addr LIMIT 15"""
  }

  /** TRUE per-token components via recursive transitive closure (see
    * [[q19Components]]); starts with "," to extend [[withEthTables]]'s
    * CTE list (requires `recursive = true`). Deliberately NOT the same
    * algorithm as the Spark side's convergence-guarded label propagation:
    * reachability is closed under DuckDB's recursive-CTE fixed point, so
    * the oracle's components are exact regardless of graph diameter and a
    * hash match proves the Spark loop converged (no symmetric unrolling
    * bug). Component label = min address in the component — byte-wise
    * string comparison of ASCII hex, identical in both engines. Closure
    * size is Σ per-component size², fine at fixture scale. */
  private val componentsOracle: String = {
    s""", und AS (SELECT DISTINCT erc20_token AS token,
                    least(erc20_from, erc20_to) AS a,
                    greatest(erc20_from, erc20_to) AS b
                  FROM erc20 WHERE erc20_from <> erc20_to),
        sym AS (SELECT token, a AS u, b AS v FROM und
                UNION ALL SELECT token, b AS u, a AS v FROM und),
        reach AS (SELECT token, u, v FROM sym
                  UNION
                  SELECT r.token, r.u, s.v
                  FROM reach r JOIN sym s ON r.token = s.token AND r.v = s.u),
        lbls AS (SELECT token, u AS addr, least(u, min(v)) AS lbl
                 FROM reach GROUP BY token, u),
        comp AS (SELECT token, lbl, count(*) AS sz FROM lbls GROUP BY token, lbl)
        SELECT token, CAST(sum(sz) AS BIGINT) AS n_nodes, count(*) AS n_components,
               max(sz) AS largest, min(sz) AS smallest
        FROM comp GROUP BY token ORDER BY token"""
  }

  /** DuckDB replica of [[graft.sources.eth.FixtureChainClient.addrSeed]]:
    * first 15 hex chars of sha256(lower(addr)) folded to a BIGINT. */
  private def addrSeedSql(col: String): String =
    s"""CAST(list_sum(list_transform(range(1,16),
        i -> (strpos('0123456789abcdef', substr(sha256(lower($col)), i, 1)) - 1)::BIGINT << (4*(15-i)))) AS BIGINT)"""

  private def tokenAddrList: String =
    graft.sources.eth.Erc20Decoder.tokenBySymbolAddr.values
      .map(_.toLowerCase).toSeq.sorted.mkString("'", "','", "'")

  val oracle: Map[String, String] = Map(
    // Reference's pinned DESCRIBE output, transcribed verbatim from
    // /root/reference/README.md:139-186 (Presto lower-cases identifiers).
    "eth_describe" ->
      """SELECT tbl, CAST(pos AS BIGINT) AS pos, col_name, data_type
         FROM (VALUES
           ('block',  1, 'block_number',           'bigint'),
           ('block',  2, 'block_hash',             'varchar(66)'),
           ('block',  3, 'block_parenthash',       'varchar(66)'),
           ('block',  4, 'block_nonce',            'varchar(18)'),
           ('block',  5, 'block_sha3uncles',       'varchar(66)'),
           ('block',  6, 'block_logsbloom',        'varchar(514)'),
           ('block',  7, 'block_transactionsroot', 'varchar(66)'),
           ('block',  8, 'block_stateroot',        'varchar(66)'),
           ('block',  9, 'block_miner',            'varchar(42)'),
           ('block', 10, 'block_difficulty',       'bigint'),
           ('block', 11, 'block_totaldifficulty',  'bigint'),
           ('block', 12, 'block_size',             'integer'),
           ('block', 13, 'block_extradata',        'varchar'),
           ('block', 14, 'block_gaslimit',         'double'),
           ('block', 15, 'block_gasused',          'double'),
           ('block', 16, 'block_timestamp',        'bigint'),
           ('block', 17, 'block_transactions',     'array(varchar(66))'),
           ('block', 18, 'block_uncles',           'array(varchar(66))'),
           ('transaction',  1, 'tx_hash',             'varchar(66)'),
           ('transaction',  2, 'tx_nonce',            'bigint'),
           ('transaction',  3, 'tx_blockhash',        'varchar(66)'),
           ('transaction',  4, 'tx_blocknumber',      'bigint'),
           ('transaction',  5, 'tx_transactionindex', 'integer'),
           ('transaction',  6, 'tx_from',             'varchar(42)'),
           ('transaction',  7, 'tx_to',               'varchar(42)'),
           ('transaction',  8, 'tx_value',            'double'),
           ('transaction',  9, 'tx_gas',              'double'),
           ('transaction', 10, 'tx_gasprice',         'double'),
           ('transaction', 11, 'tx_input',            'varchar'),
           ('erc20', 1, 'erc20_token',       'varchar'),
           ('erc20', 2, 'erc20_from',        'varchar(42)'),
           ('erc20', 3, 'erc20_to',          'varchar(42)'),
           ('erc20', 4, 'erc20_value',       'double'),
           ('erc20', 5, 'erc20_txhash',      'varchar(66)'),
           ('erc20', 6, 'erc20_blocknumber', 'bigint')
         ) AS t(tbl, pos, col_name, data_type)
         ORDER BY tbl, pos""",
    "eth_q1_blocktime" -> withEthTables(
      """SELECT a.block_number // 1000 AS blk_k, count(*) AS n,
         round(avg(b.block_timestamp - a.block_timestamp), 4) AS avg_delta,
         min(b.block_timestamp - a.block_timestamp) AS min_delta,
         max(b.block_timestamp - a.block_timestamp) AS max_delta
         FROM block a JOIN block b ON b.block_number = a.block_number + 1
         GROUP BY blk_k ORDER BY blk_k"""),
    "eth_q2_ntile_gas" -> withEthTables(
      """SELECT CAST(nt AS BIGINT) AS nt, round(avg(block_gasUsed), 4) AS avg_gas,
         round(max(block_gasUsed), 2) AS max_gas, count(*) AS n
         FROM (SELECT block_gasUsed, ntile(10) OVER (ORDER BY block_number) AS nt FROM block)
         GROUP BY nt ORDER BY nt"""),
    "eth_q10_ntile_scalable" -> withEthTables(
      """SELECT CAST(nt AS BIGINT) AS nt, round(avg(block_gasUsed), 4) AS avg_gas,
         round(max(block_gasUsed), 2) AS max_gas, count(*) AS n
         FROM (SELECT block_gasUsed, ntile(10) OVER (ORDER BY block_number) AS nt FROM block)
         GROUP BY nt ORDER BY nt"""),
    "eth_q3_top_miners" -> withEthTables(
      """SELECT block_miner, count(*) AS num FROM block WHERE block_number <= 5000
         GROUP BY block_miner ORDER BY num DESC, block_miner LIMIT 15"""),
    "eth_q4_erc20_movement" -> withEthTables(
      """SELECT erc20_token, round(sum(erc20_value), 2) AS total_moved,
         count(*) AS n_transfers
         FROM erc20 WHERE erc20_blockNumber BETWEEN 2000 AND 4000
         GROUP BY erc20_token ORDER BY erc20_token"""),
    "eth_q11_log_decode" -> withEthTables(
      """SELECT erc20_token, round(sum(erc20_value), 2) AS total_moved,
         count(*) AS n_transfers
         FROM erc20 WHERE erc20_blockNumber BETWEEN 2000 AND 4000
         GROUP BY erc20_token ORDER BY erc20_token"""),
    // exact uint256 replay from the erc20_exact string table; results
    // compared as strings (scale-0 decimals render identically on both
    // engines, no parquet-decimal canonicalization ambiguity)
    "eth_q12_wei_decimal" -> withEthTables(
      """SELECT erc20_token, count(*) AS n_transfers,
         CAST(CAST(sum(CAST(erc20_value AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS total_wei,
         CAST(max(CAST(erc20_value AS DECIMAL(38,0))) AS VARCHAR) AS max_wei
         FROM erc20_exact
         GROUP BY erc20_token ORDER BY erc20_token"""),
    // integral fixture doubles ⇒ both engines' double→decimal casts exact;
    // string-pinned like eth_q12
    "eth_q13_tx_decimal" -> withEthTables(
      """SELECT tx_blockNumber // 100 AS blk_c, count(*) AS n_tx,
         CAST(CAST(sum(CAST(tx_value AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS total_value_wei,
         CAST(max(CAST(tx_gasPrice AS DECIMAL(38,0))) AS VARCHAR) AS max_gas_price_wei
         FROM transaction WHERE tx_blockNumber <= 500
         GROUP BY blk_c ORDER BY blk_c"""),
    "eth_q14_limit_scan" -> withEthTables(
      """SELECT block_number, block_miner, block_gasUsed
         FROM block ORDER BY block_number LIMIT 20"""),
    "eth_q15_count_range" -> withEthTables(
      """SELECT count(*) AS n_blocks, min(block_number) AS min_bn,
         max(block_number) AS max_bn
         FROM block WHERE block_number BETWEEN 500 AND 4500"""),
    "eth_q16_token_graph" -> withEthTables(
      """SELECT erc20_token, count(*) AS n_transfers,
         count(DISTINCT erc20_from) AS n_senders,
         count(DISTINCT erc20_to) AS n_receivers,
         count(DISTINCT concat_ws('>', erc20_from, erc20_to)) AS n_edges
         FROM erc20 GROUP BY erc20_token ORDER BY erc20_token"""),
    "eth_q17_pagerank" -> withEthTables(pageRankOracle),
    "eth_q37_kcore" -> withEthTables(kcoreOracle),
    "eth_q19_components" -> withEthTables(componentsOracle, recursive = true),
    // the engine answers this from pushed metadata aggregates (zero block
    // fetches); the oracle recomputes it the honest way over the expected
    // parquet — a value-level check of the monotone-timestamp shortcut
    "eth_q21_time_span" -> withEthTables(
      """SELECT count(*) AS n_blocks,
                CAST(min(block_number) AS BIGINT) AS first_block,
                CAST(max(block_number) AS BIGINT) AS last_block,
                CAST(min(block_timestamp) AS BIGINT) AS first_ts,
                CAST(max(block_timestamp) AS BIGINT) AS last_ts
         FROM block WHERE block_number BETWEEN 1000 AND 4500"""),
    // signed exact-wei ledger off the erc20_exact digit strings: credit
    // to, debit from, top-15 balances, string-pinned like eth_q12
    "eth_q20_balances" -> withEthTables(
      """, led AS (
           SELECT erc20_token AS token, erc20_to AS addr,
                  CAST(erc20_value AS DECIMAL(38,0)) AS wei,
                  1 AS n_in, 0 AS n_out
           FROM erc20_exact
           UNION ALL
           SELECT erc20_token, erc20_from,
                  -CAST(erc20_value AS DECIMAL(38,0)),
                  0, 1
           FROM erc20_exact)
         SELECT token, addr,
                CAST(CAST(sum(wei) AS DECIMAL(38,0)) AS VARCHAR) AS balance_wei,
                CAST(sum(n_in) AS BIGINT) AS n_in,
                CAST(sum(n_out) AS BIGINT) AS n_out
         FROM led GROUP BY token, addr
         ORDER BY CAST(sum(wei) AS DECIMAL(38,0)) DESC, token, addr LIMIT 15"""),
    // TRUE taint closure via the recursive fixed point (asymmetric to the
    // Spark side's convergence-guarded BFS, like eth_q19); exact wei sums
    // replay from the erc20_exact digit strings, string-pinned
    "eth_q22_taint" -> withEthTables(
      """, x AS (SELECT erc20_token AS token, erc20_from AS f, erc20_to AS t,
                        CAST(erc20_value AS DECIMAL(38,0)) AS wei,
                        erc20_blockNumber AS bn
                 FROM erc20_exact),
         edges AS (SELECT DISTINCT token, f AS src, t AS dst FROM x WHERE f <> t),
         seeds AS (SELECT DISTINCT token, f AS addr FROM x WHERE bn <= 300 AND f <> t),
         reach AS (SELECT token, addr FROM seeds
                   UNION
                   SELECT e.token, e.dst
                   FROM reach r JOIN edges e ON r.token = e.token AND r.addr = e.src),
         nodes AS (SELECT DISTINCT token, addr FROM (
                     SELECT token, src AS addr FROM edges
                     UNION ALL SELECT token, dst FROM edges)),
         summ AS (SELECT n.token, count(*) AS n_addrs,
                         CAST(sum(CASE WHEN r.addr IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_tainted
                  FROM nodes n LEFT JOIN reach r ON n.token = r.token AND n.addr = r.addr
                  GROUP BY n.token),
         tv AS (SELECT x.token, count(*) AS n_tainted_transfers,
                       CAST(CAST(sum(x.wei) AS DECIMAL(38,0)) AS VARCHAR) AS tainted_value_wei
                FROM x JOIN reach r ON x.token = r.token AND x.f = r.addr
                GROUP BY x.token)
         SELECT s.token, s.n_addrs, s.n_tainted, tv.n_tainted_transfers,
                tv.tainted_value_wei
         FROM summ s JOIN tv ON s.token = tv.token
         ORDER BY s.token""", recursive = true),
    // HUGEINT mirrors the Spark side's DECIMAL(38,0) widening; every
    // divided quantity is positive, so `//` (floor) and `div` (truncate)
    // agree
    "eth_q23_gini" -> withEthTables(
      """, c AS (SELECT erc20_token AS token, erc20_from AS addr,
                        CAST(count(*) AS BIGINT) AS c
                 FROM erc20 GROUP BY 1, 2),
         r AS (SELECT token, c,
                      CAST(row_number() OVER (PARTITION BY token ORDER BY c, addr) AS BIGINT) AS i
               FROM c),
         a AS (SELECT token,
                      CAST(count(*) AS BIGINT) AS n_senders,
                      CAST(sum(c) AS HUGEINT) AS s,
                      CAST(sum(CAST(c AS HUGEINT) * i) AS HUGEINT) AS sic,
                      CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS ssq,
                      CAST(max(c) AS HUGEINT) AS cmax
               FROM r GROUP BY token)
         SELECT token, n_senders, CAST(s AS BIGINT) AS n_transfers,
                CAST(((2 * sic - (n_senders + 1) * s) * 1000000)
                     // (CAST(n_senders AS HUGEINT) * s) AS BIGINT) AS gini_micro,
                CAST((ssq * 1000000) // (s * s) AS BIGINT) AS hhi_micro,
                CAST((cmax * 1000000) // s AS BIGINT) AS top_share_micro
         FROM a ORDER BY token"""),
    // exact integer gwei histogram read-off + HUGEINT fee sums — the
    // same single-sort-free formulation the engine must equal
    "eth_q25_gas_market" -> withEthTables(
      """, t AS (SELECT tx_blockNumber // 1000 AS blk_k,
                        CAST(tx_gasPrice AS BIGINT) // 1000000000 AS gwei,
                        CAST(tx_gas AS BIGINT) * CAST(tx_gasPrice AS BIGINT) AS fee
                 FROM transaction),
         h AS (SELECT blk_k, gwei, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(fee) AS HUGEINT) AS fee_w
               FROM t GROUP BY 1, 2),
         c AS (SELECT blk_k, gwei, n, fee_w,
                      sum(n) OVER (PARTITION BY blk_k ORDER BY gwei
                                   ROWS UNBOUNDED PRECEDING) AS cum,
                      sum(n) OVER (PARTITION BY blk_k) AS nt
               FROM h)
         SELECT blk_k, CAST(max(nt) AS BIGINT) AS n_tx,
                min(CASE WHEN cum * 100 >= nt * 50 THEN gwei END) AS p50_gwei,
                min(CASE WHEN cum * 100 >= nt * 90 THEN gwei END) AS p90_gwei,
                max(gwei) AS max_gwei,
                CAST(CAST(sum(fee_w) AS HUGEINT) AS VARCHAR) AS fee_wei
         FROM c GROUP BY blk_k ORDER BY blk_k"""),
    "eth_q26_cohorts" -> withEthTables(
      """, t AS (SELECT tx_from AS addr, tx_blockNumber // 1000 AS k
                 FROM transaction),
         f AS (SELECT addr, min(k) AS cohort_k FROM t GROUP BY addr),
         a AS (SELECT DISTINCT addr, k FROM t)
         SELECT cohort_k, k - cohort_k AS age_k,
                CAST(count(*) AS BIGINT) AS n_active
         FROM f JOIN a USING (addr)
         GROUP BY 1, 2 ORDER BY 1, 2"""),
    "eth_q27_uncles" -> withEthTables(
      """SELECT block_miner,
                CAST(count(*) AS BIGINT) AS n_blocks,
                CAST(sum(len(block_uncles)) AS BIGINT) AS n_uncles,
                CAST(sum(CASE WHEN len(block_uncles) > 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS blocks_with_uncles,
                CAST(sum(len(block_uncles)) * 1000000 // count(*)
                     AS BIGINT) AS uncle_rate_micro
         FROM block GROUP BY block_miner
         ORDER BY n_blocks DESC, block_miner"""),
    // exact-wei DECIMAL ledger (the eth_q13-proven double->DECIMAL lane);
    // net/gross stringified for digit-exact comparison
    "eth_q28_eth_flow" -> withEthTables(
      """, l AS (
           SELECT tx_from AS addr, -CAST(tx_value AS DECIMAL(38,0)) AS wei,
                  1 AS n_out, 0 AS n_in, tx_to AS peer
           FROM transaction
           UNION ALL
           SELECT tx_to, CAST(tx_value AS DECIMAL(38,0)), 0, 1, tx_from
           FROM transaction WHERE tx_to IS NOT NULL)
         SELECT addr,
                CAST(CAST(sum(wei) AS DECIMAL(38,0)) AS VARCHAR) AS net_wei,
                CAST(CAST(sum(abs(wei)) AS DECIMAL(38,0)) AS VARCHAR) AS gross_wei,
                CAST(sum(n_in) AS BIGINT) AS n_in,
                CAST(sum(n_out) AS BIGINT) AS n_out,
                CAST(count(DISTINCT peer) AS BIGINT) AS n_peers
         FROM l GROUP BY addr
         ORDER BY sum(wei) DESC, addr LIMIT 20"""),
    "eth_q29_bounce" -> withEthTables(
      """, paid AS (SELECT tx_blockNumber AS bn, tx_to AS addr,
                           tx_hash AS h_in
                    FROM transaction WHERE tx_to IS NOT NULL),
         spent AS (SELECT tx_blockNumber AS bn, tx_from AS addr,
                          tx_hash AS h_out
                   FROM transaction)
         SELECT addr, CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(count(DISTINCT bn) AS BIGINT) AS n_blocks
         FROM paid JOIN spent USING (bn, addr)
         WHERE h_in <> h_out
         GROUP BY addr ORDER BY n_pairs DESC, addr LIMIT 20"""),
    "eth_q30_gas_order" -> withEthTables(
      """, t AS (SELECT tx_blockNumber AS bn, tx_transactionIndex AS idx,
                        CAST(tx_gasPrice AS BIGINT) AS gp
                 FROM transaction),
         l AS (SELECT bn, gp,
                      lag(gp) OVER (PARTITION BY bn ORDER BY idx) AS prev_gp
               FROM t)
         SELECT bn // 1000 AS blk_k,
                CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(sum(CASE WHEN gp > prev_gp THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_asc,
                CAST(sum(CASE WHEN gp > prev_gp THEN 1 ELSE 0 END) * 1000000
                     // count(*) AS BIGINT) AS asc_rate_micro
         FROM l WHERE prev_gp IS NOT NULL
         GROUP BY blk_k ORDER BY blk_k"""),
    "eth_q31_chain_integrity" -> withEthTables(
      """SELECT b.block_number // 1000 AS blk_k,
                CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(sum(CASE WHEN b.block_totalDifficulty - a.block_totalDifficulty
                              <> b.block_difficulty THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_td_violations,
                min(b.block_difficulty) AS min_difficulty,
                max(b.block_difficulty) AS max_difficulty,
                CAST(CAST(sum(CAST(b.block_difficulty AS HUGEINT)) AS HUGEINT)
                     // count(*) AS BIGINT) AS avg_difficulty
         FROM block a JOIN block b ON b.block_number = a.block_number + 1
         GROUP BY blk_k ORDER BY blk_k"""),
    "eth_q32_adoption" -> withEthTables(
      """, f AS (SELECT erc20_token AS token, erc20_to AS addr,
                        min(erc20_blockNumber) AS first_bn
                 FROM erc20 GROUP BY 1, 2),
         p AS (SELECT token, first_bn // 1000 AS blk_k,
                      CAST(count(*) AS BIGINT) AS new_adopters
               FROM f GROUP BY 1, 2)
         SELECT token, blk_k, new_adopters,
                CAST(sum(new_adopters) OVER (PARTITION BY token ORDER BY blk_k
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_adopters
         FROM p ORDER BY token, blk_k"""),
    "eth_q33_selectors" -> withEthTables(
      """SELECT CASE WHEN tx_input = '0x' THEN '(transfer)'
                ELSE substr(tx_input, 1, 10) END AS selector,
                CAST(count(*) AS BIGINT) AS n_tx,
                CAST(count(DISTINCT tx_to) AS BIGINT) AS n_to,
                CAST(sum(CAST(tx_gas AS BIGINT)) AS BIGINT) AS total_gas,
                CAST(CAST(sum(CAST(tx_gas AS HUGEINT)) AS HUGEINT)
                     // count(*) AS BIGINT) AS avg_gas
         FROM transaction GROUP BY selector
         ORDER BY n_tx DESC, selector"""),
    "eth_q34_value_histogram" -> withEthTables(
      """, t AS (SELECT CAST(tx_value AS BIGINT) AS v FROM transaction),
         h AS (SELECT CASE WHEN v = 0 THEN CAST(0 AS BIGINT)
                      ELSE CAST(length(bin(v)) AS BIGINT) END AS bits,
                      CAST(count(*) AS BIGINT) AS n_tx
               FROM t GROUP BY 1)
         SELECT bits, n_tx,
                CAST(CAST(n_tx AS HUGEINT) * 1000000 // sum(n_tx) OVER ()
                     AS BIGINT) AS share_micro
         FROM h ORDER BY bits"""),
    "eth_q24_nonce_audit" -> withEthTables(
      """SELECT CAST(count(*) AS BIGINT) AS n_addrs,
                CAST(sum(n_tx) AS BIGINT) AS n_tx,
                CAST(sum(CASE WHEN n_tx <> nd THEN 1 ELSE 0 END) AS BIGINT) AS n_with_reused,
                CAST(sum(CASE WHEN mx - mn + 1 <> nd THEN 1 ELSE 0 END) AS BIGINT) AS n_with_gaps,
                CAST(sum(n_tx - nd) AS BIGINT) AS n_reused_total,
                CAST(sum(mx - mn + 1 - nd) AS BIGINT) AS n_missing_total
         FROM (SELECT tx_from, count(*) AS n_tx,
                      CAST(min(tx_nonce) AS BIGINT) AS mn,
                      CAST(max(tx_nonce) AS BIGINT) AS mx,
                      CAST(count(DISTINCT tx_nonce) AS BIGINT) AS nd
               FROM transaction GROUP BY tx_from)"""),
    "eth_q18_triangles" -> withEthTables(
      """, und AS (SELECT DISTINCT least(erc20_from, erc20_to) AS a,
                          greatest(erc20_from, erc20_to) AS b
                   FROM erc20 WHERE erc20_from <> erc20_to),
         deg AS (SELECT n, count(*) AS deg FROM (
                   SELECT a AS n FROM und UNION ALL SELECT b FROM und)
                 GROUP BY n),
         eo AS (SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
                            THEN u.a ELSE u.b END AS src,
                       CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
                            THEN u.b ELSE u.a END AS dst,
                       CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
                            THEN db.deg ELSE da.deg END AS dd
                FROM und u JOIN deg da ON u.a = da.n JOIN deg db ON u.b = db.n),
         wedges AS (SELECT e1.src, e1.dst AS v, e2.dst AS w
                    FROM eo e1 JOIN eo e2 ON e1.src = e2.src
                    WHERE e1.dd < e2.dd OR (e1.dd = e2.dd AND e1.dst < e2.dst)),
         tri AS (SELECT count(*) AS n_triangles
                 FROM wedges JOIN eo ON wedges.v = eo.src AND wedges.w = eo.dst)
         SELECT (SELECT count(*) FROM deg) AS n_nodes,
                (SELECT count(*) FROM und) AS n_edges,
                (SELECT count(*) FROM wedges) AS n_wedges,
                n_triangles
         FROM tri"""),
    "eth_q35_jaccard" -> withEthTables(
      """, und AS (SELECT DISTINCT least(erc20_from, erc20_to) AS a,
                          greatest(erc20_from, erc20_to) AS b
                   FROM erc20 WHERE erc20_from <> erc20_to),
         deg AS (SELECT n, count(*) AS deg FROM (
                   SELECT a AS n FROM und UNION ALL SELECT b FROM und)
                 GROUP BY n),
         eo AS (SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
                            THEN u.a ELSE u.b END AS src,
                       CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
                            THEN u.b ELSE u.a END AS dst,
                       CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
                            THEN db.deg ELSE da.deg END AS dd
                FROM und u JOIN deg da ON u.a = da.n JOIN deg db ON u.b = db.n),
         tri AS (SELECT w.src, w.v, w.w
                 FROM (SELECT e1.src, e1.dst AS v, e2.dst AS w
                       FROM eo e1 JOIN eo e2 ON e1.src = e2.src
                       WHERE e1.dd < e2.dd OR (e1.dd = e2.dd AND e1.dst < e2.dst)) w
                 JOIN eo ON w.v = eo.src AND w.w = eo.dst),
         te AS (SELECT least(src, v) AS a, greatest(src, v) AS b FROM tri
                UNION ALL SELECT least(src, w), greatest(src, w) FROM tri
                UNION ALL SELECT least(v, w), greatest(v, w) FROM tri),
         cmn AS (SELECT a, b, count(*) AS cm FROM te GROUP BY a, b),
         j AS (SELECT coalesce(cmn.cm, 0) AS common, da.deg AS da, db.deg AS db
               FROM und u
               LEFT JOIN cmn ON u.a = cmn.a AND u.b = cmn.b
               JOIN deg da ON u.a = da.n JOIN deg db ON u.b = db.n),
         jm AS (SELECT common,
                       CAST(1000000 * CAST(common AS HUGEINT)
                            // (da + db - common) AS BIGINT) AS jacc_micro
                FROM j)
         SELECT jacc_micro // 100000 AS bucket, count(*) AS n_edges,
                CAST(sum(common) AS BIGINT) AS n_common,
                max(jacc_micro) AS max_jacc_micro
         FROM jm GROUP BY bucket ORDER BY bucket"""),
    "eth_q5_fromwei" -> withEthTables(
      """SELECT tx_hash, round(tx_value / 1e18, 6) AS eth_value,
         round(tx_gasPrice / 1e9, 4) AS gwei_price
         FROM transaction WHERE tx_blockNumber BETWEEN 100 AND 200
         ORDER BY tx_hash"""),
    "eth_q6_ts_range" -> withEthTables(
      """SELECT count(*) AS n_blocks, min(block_number) AS min_bn,
         max(block_number) AS max_bn, min(block_timestamp) AS min_ts,
         max(block_timestamp) AS max_ts
         FROM block WHERE block_timestamp BETWEEN 1438282988 AND 1438295988"""),
    "eth_q7_hash_lookup" -> withEthTables(
      s"""SELECT block_number, block_miner, block_size, block_timestamp
          FROM block WHERE block_hash = '${EthFixtures.blockHash(1234)}'"""),
    "eth_q8_tx_per_miner" -> withEthTables(
      """SELECT block_miner, count(*) AS n_tx, round(avg(tx_gas), 4) AS avg_gas
         FROM transaction JOIN block ON tx_blockNumber = block_number
         WHERE tx_blockNumber <= 3000
         GROUP BY block_miner ORDER BY block_miner"""),
    "eth_q9_array_cols" -> withEthTables(
      """SELECT block_number, CAST(len(block_transactions) AS BIGINT) AS n_tx,
         CAST(len(block_uncles) AS BIGINT) AS n_uncles,
         block_transactions[1] AS first_tx
         FROM block WHERE block_number <= 500 ORDER BY block_number"""),
    // fixture account state (sha256-seeded) replayed for the BATCHED
    // table-valued path: balance at the chain tip + nonce, per distinct
    // early-block sender — same seed arithmetic as the eth_udfs row
    "eth_q36_account_batch" -> withEthTables(
      s"""SELECT addr,
          (hf % 1000000) * 1e15 + ${EthFixtures.Blocks} * 1e9 AS balance_wei,
          CAST(hf % 497 + ${EthFixtures.Blocks / 1024} AS BIGINT) AS tx_count
          FROM (SELECT addr, ${addrSeedSql("addr")} AS hf
                FROM (SELECT DISTINCT tx_from AS addr FROM transaction
                      WHERE tx_blockNumber <= 50 AND tx_from IS NOT NULL))
          ORDER BY addr"""),
    "eth_udfs" -> withEthTables(
      s"""SELECT tx_hash, tx_from, tx_to,
          (hf % 1000000) * 1e15 + ${EthFixtures.Blocks} * 1e9 AS from_balance,
          (hf % 1000000) * 1e15 + tx_blockNumber * 1e9 AS from_balance_at,
          (hf % 1000000) * 1e15 + tx_blockNumber * 1e9 AS from_balance_ovl,
          (hf % 1000000) * 1e15 + 1e9 AS from_balance_earliest,
          CAST(hf % 497 + ${EthFixtures.Blocks / 1024} AS BIGINT) AS from_nonce,
          CAST(hf % 497 + ${EthFixtures.Blocks / 1024} AS BIGINT) AS from_nonce_latest,
          (lower(tx_to) IN ($tokenAddrList) OR ht % 5 = 0) AS to_is_contract,
          tx_value / 1e18 * 1e18 AS roundtrip,
          CAST(${EthFixtures.Blocks} AS BIGINT) AS tip,
          21e9 AS gas_price
          FROM (SELECT tx_hash, tx_from, tx_to, tx_blockNumber, tx_value,
                ${addrSeedSql("tx_from")} AS hf, ${addrSeedSql("tx_to")} AS ht
                FROM transaction
                WHERE tx_blockNumber <= 50 AND tx_to IS NOT NULL)
          ORDER BY tx_hash"""))
}
