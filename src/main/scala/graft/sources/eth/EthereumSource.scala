package graft.sources.eth

import java.util.OptionalLong

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 `ethereum` source — the Spark-native analogue of the whole
  * reference connector (SURVEY.md §2A): catalog + schemas (A1/A2), per-range
  * scans (A3/A4), ERC-20 decode scan (A5), split planning (A6), block-range /
  * hash / timestamp predicate pushdown (A7-A9), column pruning (A10), and row
  * serialization (A11). Registered as `spark.read.format("ethereum")` via
  * META-INF/services (the analogue of the reference's Presto `Plugin` SPI
  * registration, A20).
  *
  * Usage:
  * {{{
  *   spark.read.format("ethereum")
  *     .option("table", "block|transaction|erc20")
  *     .option("chain", "/path/to/fixture/chain")
  *     .option("blocksPerPartition", "512")    // optional
  *     .load()
  * }}}
  *
  * Scale design (vs the reference, BASELINE.md):
  *  - partitions cover K contiguous blocks (default 512) instead of the
  *    reference's 1 split = 1 block (`EthereumSplitManager.java:55-68`) —
  *    a full-chain scan plans ~40k tasks at mainnet scale, not 20M;
  *  - receipts/logs ride with their block fetch instead of one extra RPC per
  *    transaction (`EthereumLogLazyIterator.java:39-42`);
  *  - row-count/size statistics are reported per-scan (the reference reports
  *    none), so Catalyst can pick broadcast joins over shuffles;
  *  - pushed block ranges compose (conjuncts intersect, IN/OR unions) before
  *    splitting, so the scan touches exactly the selected ranges.
  */
class EthereumSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "ethereum"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EthSchemas.schemaFor(EthSchemas.kindOf(options.get("table")),
      options.getBoolean("weiDecimal", false))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new EthereumTable(
      EthSchemas.kindOf(opts.get("table")),
      Option(opts.get("chain")).getOrElse(s"${EthFixtures.DefaultDir}"),
      Option(opts.get("blocksPerPartition")).map(_.toInt).getOrElse(512),
      opts.getBoolean("weiDecimal", false))
  }
}

class EthereumTable(kind: EthSchemas.TableKind, chainDir: String,
    blocksPerPartition: Int, weiDecimal: Boolean = false,
    rawVarchar: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"ethereum.${kind.name}"
  override def schema(): StructType =
    if (rawVarchar) EthSchemas.rawSchemaFor(kind)
    else EthSchemas.schemaFor(kind, weiDecimal)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EthereumScanBuilder(kind, chainDir, blocksPerPartition, options, weiDecimal)
}

/** Algebra over inclusive block-range unions used by the pushdown. */
object BlockRanges {
  /** Intersect two unions-of-ranges (conjunctive filters). */
  def intersect(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    for { (s1, e1) <- a; (s2, e2) <- b; lo = math.max(s1, s2); hi = math.min(e1, e2)
          if lo <= hi } yield (lo, hi)

  /** Merge overlapping/adjacent ranges. */
  def normalize(rs: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val sorted = rs.filter(r => r._1 <= r._2).sortBy(_._1)
    val out = mutable.ArrayBuffer.empty[(Long, Long)]
    sorted.foreach { r =>
      if (out.nonEmpty && r._1 <= out.last._2 + 1)
        out(out.size - 1) = (out.last._1, math.max(out.last._2, r._2))
      else out += r
    }
    out.toSeq
  }

  /** First (or, `fromEnd`, last) `k` blocks of a normalized union — the
    * range truncation behind block-table LIMIT/TopN pushdown. */
  def truncateBlocks(rs: Seq[(Long, Long)], k: Long, fromEnd: Boolean): Seq[(Long, Long)] = {
    val ordered = if (fromEnd) rs.reverse else rs
    var remaining = k
    val out = mutable.ArrayBuffer.empty[(Long, Long)]
    ordered.foreach { case (s, e) =>
      if (remaining > 0) {
        val len = math.min(e - s + 1, remaining)
        out += (if (fromEnd) (e - len + 1, e) else (s, s + len - 1))
        remaining -= len
      }
    }
    if (fromEnd) out.reverse.toSeq else out.toSeq
  }
}

class EthereumScanBuilder(kind: EthSchemas.TableKind, chainDir: String,
    blocksPerPartition: Int,
    options: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty(),
    weiDecimal: Boolean = false)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownTopN
    with SupportsPushDownAggregates {

  private val numberCol = EthSchemas.blockNumberColumn(kind)
  private val hashCol = EthSchemas.blockHashColumn(kind)
  private val fullSchema = EthSchemas.schemaFor(kind, weiDecimal)

  private var requiredSchema: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  /** Conjunction of per-filter range unions; None = unconstrained. */
  private var ranges: Option[Seq[(Long, Long)]] = None
  /** Pushed LIMIT: cap on rows each task emits; for the block table also a
    * cap on planned blocks (1 row per block). */
  private var limit: Option[Int] = None
  /** TopN on block_number (block table only): take the limit from the low
    * (asc) or high (desc) end of the resolved ranges. */
  private var topNDesc: Option[Boolean] = None
  /** Fully-pushed aggregate tokens ("count" | "min" | "max"), in the
    * aggregation's expression order — answered from range metadata, no
    * block fetch. */
  private var pushedAggs: Seq[String] = Nil

  @transient private lazy val client = EthClient.forChain(chainDir)

  private def addConjunct(rs: Seq[(Long, Long)]): Unit =
    ranges = Some(BlockRanges.normalize(
      ranges.map(BlockRanges.intersect(_, rs)).getOrElse(rs)))

  /** Translate one filter into a union of block ranges, if it constrains the
    * scan (mirrors `EthereumMetadata.java:190-229`). */
  private def toRanges(f: Filter): Option[Seq[(Long, Long)]] = f match {
    case EqualTo(c, v: Number) if c == numberCol => Some(Seq((v.longValue, v.longValue)))
    case GreaterThan(c, v: Number) if c == numberCol => Some(Seq((v.longValue + 1, Long.MaxValue)))
    case GreaterThanOrEqual(c, v: Number) if c == numberCol => Some(Seq((v.longValue, Long.MaxValue)))
    case LessThan(c, v: Number) if c == numberCol => Some(Seq((Long.MinValue, v.longValue - 1)))
    case LessThanOrEqual(c, v: Number) if c == numberCol => Some(Seq((Long.MinValue, v.longValue)))
    case In(c, vs) if c == numberCol =>
      Some(vs.toSeq.collect { case v: Number => (v.longValue, v.longValue) })
    case Or(l, r) =>
      for { lr <- toRanges(l); rr <- toRanges(r) } yield lr ++ rr
    case And(l, r) =>
      (toRanges(l), toRanges(r)) match {
        case (Some(a), Some(b)) => Some(BlockRanges.intersect(a, b))
        case (a, b) => a.orElse(b)
      }
    case EqualTo(c, v: String) if hashCol.contains(c) =>
      // hash point lookup -> single-block range via the client
      // (`EthereumMetadata.java:200-214`); unknown hash -> empty scan.
      Some(client.blockNumberByHash(v).map(n => (n, n)).toSeq)
    // timestamp range -> block range via binary search over the chain
    // (`EthereumMetadata.java:215-229, 293-318`); block table only.
    case GreaterThan(c, v: Number) if kind == EthSchemas.Block && c == "block_timestamp" =>
      Some(Seq((findBlockByTimestamp(v.longValue, -1L), Long.MaxValue)))
    case GreaterThanOrEqual(c, v: Number) if kind == EthSchemas.Block && c == "block_timestamp" =>
      Some(Seq((findBlockByTimestamp(v.longValue, -1L), Long.MaxValue)))
    case LessThan(c, v: Number) if kind == EthSchemas.Block && c == "block_timestamp" =>
      Some(Seq((Long.MinValue, findBlockByTimestamp(v.longValue, 1L))))
    case LessThanOrEqual(c, v: Number) if kind == EthSchemas.Block && c == "block_timestamp" =>
      Some(Seq((Long.MinValue, findBlockByTimestamp(v.longValue, 1L))))
    case _ => None
  }

  /** Binary search chain timestamps (monotone) for the block at/near `ts`
    * (mirrors `EthereumMetadata.java:293-318`; `offset` keeps the result a
    * conservative bound, the residual filter re-checks exact rows). */
  private def findBlockByTimestamp(ts: Long, offset: Long): Long = {
    val tip = client.blockNumber()
    if (tip <= 1) return tip
    var low = 1L; var high = tip; var middle = low + (high - low) / 2
    while (low <= high) {
      middle = low + (high - low) / 2
      val t = client.timestampOf(middle)
      if (t < ts) low = middle + 1
      else if (t > ts) high = middle - 1
      else return middle
    }
    middle + offset
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // Translate each filter once: timestamp predicates binary-search the
    // chain (log(tip) point fetches on the driver), so a second toRanges
    // pass would double the planning-time I/O.
    val translated = filters.flatMap(f => toRanges(f).map(f -> _))
    translated.foreach { case (_, rs) => addConjunct(rs) }
    pushed = translated.map(_._1)
    // Precise block-number predicates are fully honored by the range scan;
    // hash/timestamp rewrites only narrow it, so those (and everything
    // unsupported) stay residual for Spark to re-evaluate.
    filters.filterNot {
      case f @ (EqualTo(_, _: Number) | GreaterThan(_, _: Number) |
                GreaterThanOrEqual(_, _: Number) | LessThan(_, _: Number) |
                LessThanOrEqual(_, _: Number) | In(_, _)) =>
        f.references.sameElements(Array(numberCol))
      case _ => false
    }
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(schema: StructType): Unit = requiredSchema = schema

  /** LIMIT pushdown (reference gap closed — Presto's connector doesn't push
    * limit either, but at 100× a `LIMIT 10` must not fetch a 512-block
    * partition). Block table: 1 row per block, so the plan itself shrinks
    * to ≤ `limit` blocks. Fan-out tables: each task stops fetching blocks
    * once it has emitted `limit` rows (an early-exit bound; a task cannot
    * know another task's fan-out, so the scan stays partially pushed and
    * Spark keeps its own Limit on top). */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  override def isPartiallyPushed(): Boolean = true

  /** TopN pushdown for the chain's natural order: block_number on the
    * block table is monotone over the scan, so the top-N rows are exactly
    * the first (asc) or last (desc) N blocks of the resolved ranges.
    * Partial push — Spark keeps TakeOrderedAndProject for the final
    * cross-partition order; the scan just stops planning everything else. */
  override def pushTopN(orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      l: Int): Boolean = {
    if (kind != EthSchemas.Block || orders.length != 1) return false
    orders(0).expression() match {
      case nr: org.apache.spark.sql.connector.expressions.NamedReference
          if nr.fieldNames.sameElements(Array("block_number")) =>
        limit = Some(l)
        topNDesc = Some(orders(0).direction() ==
          org.apache.spark.sql.connector.expressions.SortDirection.DESCENDING)
        true
      case _ => false
    }
  }

  /** COUNT(*), MIN/MAX(block_number) and MIN/MAX(block_timestamp) over
    * the block table are answerable from range metadata alone: 1 row per
    * block, ranges already clipped to the tip at plan time, and chain
    * timestamps are MONOTONE in block number — so min/max(timestamp)
    * over a range union is `timestampOf(first/last block)`, two point
    * fetches, zero block scans (the inverse of the timestamp→block
    * binary search above). Spark only pushes aggregates when every
    * filter was fully pushed, so residual hash/timestamp predicates
    * disable this automatically. */
  private def aggToken(
      f: org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc): Option[String] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    def named(e: org.apache.spark.sql.connector.expressions.Expression, col: String): Boolean =
      e match {
        case nr: NamedReference => nr.fieldNames.sameElements(Array(col))
        case _ => false
      }
    f match {
      case _: CountStar => Some("count")
      case m: Min if named(m.column, "block_number") => Some("min")
      case m: Max if named(m.column, "block_number") => Some("max")
      case m: Min if named(m.column, "block_timestamp") => Some("min_ts")
      case m: Max if named(m.column, "block_timestamp") => Some("max_ts")
      case _ => None
    }
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    kind == EthSchemas.Block && agg.groupByExpressions().isEmpty &&
      agg.aggregateExpressions().nonEmpty &&
      agg.aggregateExpressions().forall(f => aggToken(f).isDefined)

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    if (!supportCompletePushDown(agg)) return false
    pushedAggs = agg.aggregateExpressions().toSeq.map(f => aggToken(f).get)
    requiredSchema = StructType(pushedAggs.zipWithIndex.map { case (t, i) =>
      org.apache.spark.sql.types.StructField(s"agg_${t}_$i",
        org.apache.spark.sql.types.LongType, nullable = t != "count")
    })
    true
  }

  override def build(): Scan =
    new EthereumScan(kind, chainDir, requiredSchema, ranges, blocksPerPartition, options,
      limit = limit, topNDesc = topNDesc,
      pushedAggs = pushedAggs)
}

case class EthereumInputPartition(start: Long, end: Long) extends InputPartition
/** Carries the metadata answers of a fully-pushed aggregation — one value
  * per pushed count/min/max expression (None = empty-range null). */
case class EthereumAggPartition(values: Seq[Option[Long]]) extends InputPartition

/** DSv2 custom metrics surfaced in the SQL UI per scan — fetch/emit
  * observability a chain source needs at cluster scale (blocks fetched ≠
  * rows emitted for the fan-out tables). */
object EthMetrics {
  class BlocksFetched extends org.apache.spark.sql.connector.metric.CustomSumMetric {
    override def name(): String = "blocksFetched"
    override def description(): String = "blocks fetched from the chain backend"
  }
  class RowsEmitted extends org.apache.spark.sql.connector.metric.CustomSumMetric {
    override def name(): String = "rowsEmitted"
    override def description(): String = "rows emitted after decode/fan-out"
  }
  case class Value(name: String, value: Long)
      extends org.apache.spark.sql.connector.metric.CustomTaskMetric
}

class EthereumScan(kind: EthSchemas.TableKind, chainDir: String,
    requiredSchema: StructType, ranges: Option[Seq[(Long, Long)]],
    blocksPerPartition: Int,
    options: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty(),
    limit: Option[Int] = None, topNDesc: Option[Boolean] = None,
    pushedAggs: Seq[String] = Nil)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {

  /** Runtime (DPP-style) filtering: when this scan sits under a join on
    * its block-number column, Spark hands the realized join-key values
    * after planning; they intersect the static ranges so only the joined
    * blocks are fetched — the chain-source analogue of dynamic partition
    * pruning. */
  private var runtimeRanges: Option[Seq[(Long, Long)]] = None

  /** Runtime filtering (DPP-style range narrowing) keys on the table's
    * block-number column — but ONLY while that column survives column
    * pruning: Spark's PartitionPruning rule resolves these references
    * against the scan's pruned output and throws on a dangling one (hit
    * by any join over a scan projecting neither key, e.g. the transfer
    * graph's from/to-only edge scan). */
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] = {
    val col = EthSchemas.blockNumberColumn(kind)
    if (requiredSchema.fieldNames.contains(col))
      Array(org.apache.spark.sql.connector.expressions.Expressions.column(col))
    else Array.empty
  }

  override def filter(filters: Array[Filter]): Unit = {
    val numberCol = EthSchemas.blockNumberColumn(kind)
    val rs = filters.collect {
      case In(c, vs) if c == numberCol =>
        BlockRanges.normalize(vs.toSeq.collect { case v: Number => (v.longValue, v.longValue) })
      case EqualTo(c, v: Number) if c == numberCol => Seq((v.longValue, v.longValue))
    }
    if (rs.nonEmpty) runtimeRanges = Some(rs.reduce(BlockRanges.intersect))
  }

  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    def opt(k: String, dflt: Long) = Option(options.get(k)).map(_.toLong).getOrElse(dflt)
    new graft.streaming.EthereumMicroBatchStream(kind, chainDir, requiredSchema,
      blocksPerPartition,
      startBlock = opt("startBlock", 1L),
      maxBlocksPerBatch = opt("maxBlocksPerBatch", Long.MaxValue / 4),
      lagBlocks = opt("lagBlocks", 0L))
  }
  override def description(): String = {
    val r = ranges.map(_.map { case (s, e) => s"[$s,$e]" }.mkString(",")).getOrElse("full-chain")
    val lim = limit.map(l => s" pushedLimit=$l" +
      topNDesc.map(d => s" topN=block_number ${if (d) "DESC" else "ASC"}").getOrElse("")).getOrElse("")
    val cnt = if (pushedAggs.nonEmpty)
      s" pushedAggregate=${pushedAggs.map { case "count" => "count(*)"
        case "min_ts" => "min(block_timestamp)"
        case "max_ts" => "max(block_timestamp)"
        case t => s"$t(block_number)" }.mkString(",")}"
    else ""
    s"ethereum.${kind.name} ranges=$r$lim$cnt"
  }

  private def resolvedRanges: Seq[(Long, Long)] = {
    val tip = EthClient.forChain(chainDir).blockNumber()
    val static = ranges.getOrElse(Seq((1L, tip)))
    val combined = runtimeRanges.map(BlockRanges.intersect(static, _)).getOrElse(static)
    val clipped = BlockRanges.normalize(combined.map { case (s, e) =>
      (math.max(1L, s), math.min(tip, e))
    })
    // block table emits 1 row per block, so a pushed LIMIT/TopN truncates
    // the PLAN to its first (asc) or last (desc) `limit` blocks
    (kind, limit) match {
      case (EthSchemas.Block, Some(k)) =>
        BlockRanges.truncateBlocks(clipped, k.toLong, fromEnd = topNDesc.getOrElse(false))
      case _ => clipped
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    if (pushedAggs.nonEmpty) {
      // fully-pushed aggregation: one metadata row; zero block fetches for
      // count/min/max(block_number), two POINT fetches for the timestamp
      // endpoints (monotone chain timestamps: min/max(ts) over a range
      // union live at its first/last block)
      val rs = resolvedRanges
      val blocks = rs.map { case (s, e) => e - s + 1 }.sum
      lazy val client = EthClient.forChain(chainDir)
      Array(EthereumAggPartition(pushedAggs.map {
        case "count"  => Some(blocks)
        case "min"    => rs.headOption.map(_._1)
        case "max"    => rs.lastOption.map(_._2)
        case "min_ts" => rs.headOption.map(r => client.timestampOf(r._1))
        case "max_ts" => rs.lastOption.map(r => client.timestampOf(r._2))
      }))
    } else
      resolvedRanges.flatMap { case (s, e) =>
        Iterator.range(s, e + 1, blocksPerPartition.toLong)
          .map(p => EthereumInputPartition(p, math.min(e, p + blocksPerPartition - 1)))
      }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new EthereumReaderFactory(kind, chainDir, requiredSchema, rowLimit = limit,
      columnar = options.getBoolean("columnar", true))

  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new EthMetrics.BlocksFetched, new EthMetrics.RowsEmitted)

  /** Rows≈blocks×fan-out, size≈rows×row-width — coarse but enough for
    * Catalyst to choose broadcast joins (the reference reports nothing). */
  override def estimateStatistics(): Statistics = new Statistics {
    private val blocks = resolvedRanges.map { case (s, e) => e - s + 1 }.sum
    private val rows = kind match {
      case EthSchemas.Block => blocks
      case EthSchemas.Transaction => (blocks * 2.5).toLong
      case EthSchemas.Erc20 => (blocks * 1.5).toLong
      case EthSchemas.Log => (blocks * 2.0).toLong
    }
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(rows * requiredSchema.map(_.dataType.defaultSize + 40L).sum)
    override def numRows(): OptionalLong = OptionalLong.of(rows)
  }
}

class EthereumReaderFactory(kind: EthSchemas.TableKind, chainDir: String,
    schema: StructType, rowLimit: Option[Int] = None,
    columnar: Boolean = true) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case EthereumAggPartition(values) => new PartitionReader[InternalRow] {
        private var done = false
        override def next(): Boolean = { val h = !done; done = true; h }
        override def get(): InternalRow =
          new GenericInternalRow(values.map(_.map(Long.box).orNull).toArray[Any])
        override def close(): Unit = ()
      }
      case p: EthereumInputPartition =>
        new EthereumPartitionReader(kind, chainDir, schema, p.start, p.end, rowLimit)
    }

  /** All three tables read columnar: decoded values land directly in
    * `OnHeapColumnVector`s, so downstream whole-stage codegen consumes
    * vectors like a parquet scan instead of one `GenericInternalRow` per
    * row (the same reason Spark's own file sources are columnar). The
    * fan-out tables flatten block→transactions / block→transfers into the
    * batch stream. The `columnar=false` read option drops to the
    * row-at-a-time reader — a debug/measurement knob (TxScanBench uses it
    * for before/after evidence), not a production path. */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    columnar && !partition.isInstanceOf[EthereumAggPartition]
  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val p = partition.asInstanceOf[EthereumInputPartition]
    new EthereumColumnarReader(kind, chainDir, schema, p.start, p.end, rowLimit = rowLimit)
  }
}

/** Columnar reader: decodes rows of any of the three tables straight into
  * on-heap column vectors (`batchRows` rows per `ColumnarBatch`). */
class EthereumColumnarReader(kind: EthSchemas.TableKind, chainDir: String,
    schema: StructType, start: Long, end: Long, batchRows: Int = 1024,
    rowLimit: Option[Int] = None)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.{OnHeapColumnVector, WritableColumnVector}
  import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
  import java.nio.charset.StandardCharsets.UTF_8

  private val client = EthClient.forChain(chainDir)
  private val needTx = kind != EthSchemas.Block ||
    schema.fieldNames.contains("block_transactions")
  // only the log-consuming kinds pay for receipt fetches (live backend:
  // one extra RPC batch per block) — mirrors the reference's lazy receipt
  // iterator running only on the erc20 branch
  private val needLogs = kind == EthSchemas.Erc20 || kind == EthSchemas.Log
  private var blocksFetched = 0L
  private var rowsEmitted = 0L
  private val blocks: Iterator[EthBlockData] =
    client.blocks(start, end, fullTx = needTx, needLogs = needLogs)
      .map { b => blocksFetched += 1; b }
  private val chunks: Iterator[Seq[AnyRef]] = {
    val base = (kind match {
      case EthSchemas.Block => blocks
      case EthSchemas.Transaction => blocks.flatMap(_.transactions.iterator)
      case EthSchemas.Erc20 => blocks.flatMap(Erc20Decoder.decodeBlock)
      case EthSchemas.Log => blocks.flatMap(_.transactions.iterator.flatMap(_.logs))
    }).asInstanceOf[Iterator[AnyRef]]
    // pushed LIMIT: stop pulling (and therefore fetching) blocks once this
    // task has emitted `limit` rows — the lazy block iterator never advances
    // past the last needed block
    rowLimit.map(base.take).getOrElse(base).grouped(batchRows)
  }
  // one vector set for the reader's lifetime, reset between batches —
  // allocating a fresh OnHeapColumnVector set per chunk was one of the
  // two costs that made the first columnar reader SLOWER than the row
  // reader on a full tx decode (TxScanBench, round 10)
  private val vectors = OnHeapColumnVector.allocateColumns(batchRows, schema)
  private val batch = new ColumnarBatch(vectors.toArray[ColumnVector], 0)

  private def putDec(v: WritableColumnVector, r: Int, bd: java.math.BigDecimal): Unit = {
    val d = org.apache.spark.sql.types.Decimal(BigDecimal(bd))
    if (!d.changePrecision(38, 0))
      throw new ArithmeticException(
        s"wei value $bd overflows DECIMAL(38,0); unset weiDecimal or pre-scale")
    v.putDecimal(r, d, 38)
  }

  private def putStr(v: WritableColumnVector, r: Int, s: String): Unit =
    if (s == null) v.putNull(r) else v.putByteArray(r, s.getBytes(UTF_8))
  private def putStrArray(v: WritableColumnVector, r: Int, vs: Seq[String]): Unit = {
    val child = v.arrayData()
    val offset = child.getElementsAppended
    vs.foreach { s => val b = s.getBytes(UTF_8); child.appendByteArray(b, 0, b.length) }
    v.putArray(r, offset, vs.length)
  }

  /** Per-column filler CLOSURES, resolved ONCE at construction — the
    * other round-10 fix: dispatching on the column NAME per cell cost a
    * string-equality chain per value (27M matches on a 2.5M-row tx
    * scan); the hot loop is now one invoke per cell. */
  private def blockFiller(v: WritableColumnVector, name: String): (AnyRef, Int) => Unit = {
    @inline def d(row: AnyRef) = row.asInstanceOf[EthBlockData]
    name match {
      case "block_number" => (row, r) => v.putLong(r, d(row).number)
      case "block_hash" => (row, r) => putStr(v, r, d(row).hash)
      case "block_parentHash" => (row, r) => putStr(v, r, d(row).parentHash)
      case "block_nonce" => (row, r) => putStr(v, r, d(row).nonce)
      case "block_sha3Uncles" => (row, r) => putStr(v, r, d(row).sha3Uncles)
      case "block_logsBloom" => (row, r) => putStr(v, r, d(row).logsBloom)
      case "block_transactionsRoot" => (row, r) => putStr(v, r, d(row).transactionsRoot)
      case "block_stateRoot" => (row, r) => putStr(v, r, d(row).stateRoot)
      case "block_miner" => (row, r) => putStr(v, r, d(row).miner)
      case "block_difficulty" => (row, r) => v.putLong(r, d(row).difficulty)
      case "block_totalDifficulty" => (row, r) => v.putLong(r, d(row).totalDifficulty)
      case "block_size" => (row, r) => v.putInt(r, d(row).size)
      case "block_extraData" => (row, r) => putStr(v, r, d(row).extraData)
      case "block_gasLimit" => (row, r) => v.putDouble(r, d(row).gasLimit)
      case "block_gasUsed" => (row, r) => v.putDouble(r, d(row).gasUsed)
      case "block_timestamp" => (row, r) => v.putLong(r, d(row).timestamp)
      case "block_transactions" => (row, r) => putStrArray(v, r, d(row).transactions.map(_.hash))
      case "block_uncles" => (row, r) => putStrArray(v, r, d(row).uncles)
      case other => throw new IllegalArgumentException(s"unknown block column $other")
    }
  }

  private def txFiller(v: WritableColumnVector,
      f: org.apache.spark.sql.types.StructField): (AnyRef, Int) => Unit = {
    @inline def d(row: AnyRef) = row.asInstanceOf[EthTx]
    val dec = f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType]
    f.name match {
      case "tx_hash" => (row, r) => putStr(v, r, d(row).hash)
      case "tx_nonce" => (row, r) => v.putLong(r, d(row).nonce)
      case "tx_blockHash" => (row, r) => putStr(v, r, d(row).blockHash)
      case "tx_blockNumber" => (row, r) => v.putLong(r, d(row).blockNumber)
      case "tx_transactionIndex" => (row, r) => v.putInt(r, d(row).transactionIndex)
      case "tx_from" => (row, r) => putStr(v, r, d(row).from)
      case "tx_to" => (row, r) => putStr(v, r, d(row).to.orNull)
      case "tx_value" =>
        if (dec) (row, r) => putDec(v, r, new java.math.BigDecimal(d(row).value))
        else (row, r) => v.putDouble(r, d(row).value)
      case "tx_gas" => (row, r) => v.putDouble(r, d(row).gas)
      case "tx_gasPrice" =>
        if (dec) (row, r) => putDec(v, r, new java.math.BigDecimal(d(row).gasPrice))
        else (row, r) => v.putDouble(r, d(row).gasPrice)
      case "tx_input" => (row, r) => putStr(v, r, d(row).input)
      case other => throw new IllegalArgumentException(s"unknown tx column $other")
    }
  }

  private def ercFiller(v: WritableColumnVector,
      f: org.apache.spark.sql.types.StructField): (AnyRef, Int) => Unit = {
    @inline def d(row: AnyRef) = row.asInstanceOf[Erc20Decoder.Erc20Transfer]
    val dec = f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType]
    f.name match {
      case "erc20_token" => (row, r) => putStr(v, r, d(row).token)
      case "erc20_from" => (row, r) => putStr(v, r, d(row).from)
      case "erc20_to" => (row, r) => putStr(v, r, d(row).to)
      case "erc20_value" =>
        if (dec) (row, r) => putDec(v, r, new java.math.BigDecimal(d(row).valueExact))
        else (row, r) => v.putDouble(r, d(row).value)
      case "erc20_txHash" => (row, r) => putStr(v, r, d(row).txHash)
      case "erc20_blockNumber" => (row, r) => v.putLong(r, d(row).blockNumber)
      case other => throw new IllegalArgumentException(s"unknown erc20 column $other")
    }
  }

  private def logFiller(v: WritableColumnVector, name: String): (AnyRef, Int) => Unit = {
    @inline def d(row: AnyRef) = row.asInstanceOf[EthLog]
    name match {
      case "log_address" => (row, r) => putStr(v, r, d(row).address)
      case "log_topics" => (row, r) => putStrArray(v, r, d(row).topics)
      case "log_data" => (row, r) => putStr(v, r, d(row).data)
      case "log_txHash" => (row, r) => putStr(v, r, d(row).transactionHash)
      case "log_blockNumber" => (row, r) => v.putLong(r, d(row).blockNumber)
      case other => throw new IllegalArgumentException(s"unknown log column $other")
    }
  }

  private val fillers: Array[(AnyRef, Int) => Unit] =
    schema.fields.zipWithIndex.map { case (f, c) =>
      val v = vectors(c)
      kind match {
        case EthSchemas.Block => blockFiller(v, f.name)
        case EthSchemas.Transaction => txFiller(v, f)
        case EthSchemas.Erc20 => ercFiller(v, f)
        case EthSchemas.Log => logFiller(v, f.name)
      }
    }

  override def next(): Boolean = {
    if (!chunks.hasNext) return false
    val rows = chunks.next()
    var c = 0
    while (c < vectors.length) { vectors(c).reset(); c += 1 }
    var r = 0
    val it = rows.iterator
    while (it.hasNext) {
      val row = it.next()
      var i = 0
      while (i < fillers.length) { fillers(i)(row, r); i += 1 }
      r += 1
    }
    batch.setNumRows(rows.length)
    rowsEmitted += rows.length
    true
  }
  override def get(): ColumnarBatch = batch
  override def close(): Unit = batch.close()
  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(EthMetrics.Value("blocksFetched", blocksFetched),
          EthMetrics.Value("rowsEmitted", rowsEmitted))
}

/** Streams one block range and emits pruned `InternalRow`s. Fan-out per
  * table kind mirrors the reference's cursor branches
  * (`EthereumRecordCursor.java:109-189`): block→1 row, block→N tx rows,
  * block→decoded transfer rows. */
class EthereumPartitionReader(kind: EthSchemas.TableKind, chainDir: String,
    schema: StructType, start: Long, end: Long,
    rowLimit: Option[Int] = None) extends PartitionReader[InternalRow] {

  private val client = EthClient.forChain(chainDir)
  private var blocksFetched = 0L
  private var rowsEmitted = 0L

  private def utf8(s: String): UTF8String = if (s == null) null else UTF8String.fromString(s)
  private def arr(v: Seq[String]): GenericArrayData =
    new GenericArrayData(v.map(utf8).toArray[Any])

  private val blockExtractors: Map[String, EthBlockData => Any] = Map(
    "block_number" -> (_.number), "block_hash" -> (b => utf8(b.hash)),
    "block_parentHash" -> (b => utf8(b.parentHash)), "block_nonce" -> (b => utf8(b.nonce)),
    "block_sha3Uncles" -> (b => utf8(b.sha3Uncles)), "block_logsBloom" -> (b => utf8(b.logsBloom)),
    "block_transactionsRoot" -> (b => utf8(b.transactionsRoot)),
    "block_stateRoot" -> (b => utf8(b.stateRoot)), "block_miner" -> (b => utf8(b.miner)),
    "block_difficulty" -> (_.difficulty), "block_totalDifficulty" -> (_.totalDifficulty),
    "block_size" -> (_.size), "block_extraData" -> (b => utf8(b.extraData)),
    "block_gasLimit" -> (_.gasLimit), "block_gasUsed" -> (_.gasUsed),
    "block_timestamp" -> (_.timestamp),
    "block_transactions" -> (b => arr(b.transactions.map(_.hash))),
    "block_uncles" -> (b => arr(b.uncles)))

  private val txExtractors: Map[String, EthTx => Any] = Map(
    "tx_hash" -> (t => utf8(t.hash)), "tx_nonce" -> (_.nonce),
    "tx_blockHash" -> (t => utf8(t.blockHash)), "tx_blockNumber" -> (_.blockNumber),
    "tx_transactionIndex" -> (_.transactionIndex), "tx_from" -> (t => utf8(t.from)),
    "tx_to" -> (t => t.to.map(utf8).orNull), "tx_value" -> (_.value),
    "tx_gas" -> (_.gas), "tx_gasPrice" -> (_.gasPrice), "tx_input" -> (t => utf8(t.input)))

  private val ercExtractors: Map[String, Erc20Decoder.Erc20Transfer => Any] = Map(
    "erc20_token" -> (e => utf8(e.token)), "erc20_from" -> (e => utf8(e.from)),
    "erc20_to" -> (e => utf8(e.to)), "erc20_value" -> (_.value),
    "erc20_txHash" -> (e => utf8(e.txHash)), "erc20_blockNumber" -> (_.blockNumber))

  /** Exact-decimal conversion for `weiDecimal` mode. A real uint256 can
    * exceed DECIMAL(38,0) (max ~1.16e77 vs 1e38); surfacing a silently
    * truncated value would break the "exact wei" contract, so overflow
    * fails loudly (ANSI-style) instead. */
  private def dec(bd: java.math.BigDecimal): org.apache.spark.sql.types.Decimal = {
    val d = org.apache.spark.sql.types.Decimal(BigDecimal(bd))
    if (!d.changePrecision(38, 0))
      throw new ArithmeticException(
        s"wei value $bd overflows DECIMAL(38,0); unset weiDecimal or pre-scale")
    d
  }

  /** Wei columns surface as DECIMAL(38,0) when the field type asks for it
    * (the `weiDecimal` option); erc20 uses the exact uint256 from the log,
    * tx fields convert their (integral) doubles. */
  private def txExtractor(f: org.apache.spark.sql.types.StructField): EthTx => Any =
    f.dataType match {
      case _: org.apache.spark.sql.types.DecimalType if f.name == "tx_value" =>
        t => dec(new java.math.BigDecimal(t.value))
      case _: org.apache.spark.sql.types.DecimalType if f.name == "tx_gasPrice" =>
        t => dec(new java.math.BigDecimal(t.gasPrice))
      case _ => txExtractors(f.name)
    }

  private def ercExtractor(f: org.apache.spark.sql.types.StructField)
      : Erc20Decoder.Erc20Transfer => Any =
    f.dataType match {
      case _: org.apache.spark.sql.types.DecimalType if f.name == "erc20_value" =>
        e => dec(new java.math.BigDecimal(e.valueExact))
      case _ => ercExtractors(f.name)
    }

  private val rows: Iterator[InternalRow] = {
    // pruned block-only scans skip transaction materialization entirely;
    // receipts are fetched only for the log-consuming kinds
    val needTx = kind != EthSchemas.Block ||
      schema.fieldNames.contains("block_transactions")
    val needLogs = kind == EthSchemas.Erc20 || kind == EthSchemas.Log
    val blocks = client.blocks(start, end, fullTx = needTx, needLogs = needLogs)
      .map { b => blocksFetched += 1; b }
    val base = kind match {
      case EthSchemas.Block =>
        val fs = schema.fieldNames.map(blockExtractors)
        blocks.map(b => new GenericInternalRow(fs.map(_.apply(b)).toArray[Any]))
      case EthSchemas.Transaction =>
        val fs = schema.fields.map(txExtractor)
        blocks.flatMap(_.transactions.iterator)
          .map(t => new GenericInternalRow(fs.map(_.apply(t)).toArray[Any]))
      case EthSchemas.Erc20 =>
        val fs = schema.fields.map(ercExtractor)
        blocks.flatMap(Erc20Decoder.decodeBlock)
          .map(e => new GenericInternalRow(fs.map(_.apply(e)).toArray[Any]))
      case EthSchemas.Log =>
        val logExtractors: Map[String, EthLog => Any] = Map(
          "log_address" -> (l => utf8(l.address)),
          "log_topics" -> (l => arr(l.topics)),
          "log_data" -> (l => utf8(l.data)),
          "log_txHash" -> (l => utf8(l.transactionHash)),
          "log_blockNumber" -> (_.blockNumber))
        val fs = schema.fieldNames.map(logExtractors)
        blocks.flatMap(_.transactions.iterator.flatMap(_.logs))
          .map(l => new GenericInternalRow(fs.map(_.apply(l)).toArray[Any]))
    }
    // pushed LIMIT: early-exit after `limit` rows (see columnar reader)
    rowLimit.map(base.take).getOrElse(base)
  }

  private var current: InternalRow = _
  override def next(): Boolean = {
    val h = rows.hasNext
    if (h) { current = rows.next(); rowsEmitted += 1 }
    h
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(EthMetrics.Value("blocksFetched", blocksFetched),
          EthMetrics.Value("rowsEmitted", rowsEmitted))
}
