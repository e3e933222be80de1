package graft.streaming

import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}

import graft.sources.eth._

/** Tip-following streaming extension (SURVEY.md §7): the reference resolves
  * `[startBlock, tip]` once at split-planning time
  * (`EthereumSplitManager.java:51-68`) and is strictly batch; here the same
  * range logic becomes a Structured Streaming `MicroBatchStream` whose
  * offsets are block numbers — `latestOffset` polls the chain tip, each
  * micro-batch covers `(lastBlock, newTip]` chunked into the same
  * K-blocks-per-partition input partitions as the batch scan.
  *
  * Offsets are inclusive-end block numbers: offset N means blocks ≤ N have
  * been processed.
  *
  * **Reorg semantics**: the source emits a block exactly once and never
  * retracts — so correctness under chain reorganizations is a
  * *finality-lag* contract. `latestOffset` caps every batch at
  * `tip - lagBlocks`: blocks inside the lag window are withheld until the
  * chain has built `lagBlocks` descendants on top of them. A reorg of
  * depth ≤ `lagBlocks` therefore only ever replaces blocks that were
  * never emitted, and the stream emits the winning branch when it clears
  * the window (spec: `EthStreamSpec`("lag-bounded stream never emits
  * orphaned blocks across a reorg") rewrites the chain under a running
  * query). A reorg DEEPER than the configured lag orphans already-emitted
  * rows — the operator must size `lagBlocks` to the chain's finality
  * depth (post-merge Ethereum finalizes in ~2 epochs ≈ 64 slots; the
  * reference connector has no reorg handling at all, it re-reads the
  * chain per query).
  *
  * Implements `SupportsTriggerAvailableNow`: `Trigger.AvailableNow` pins the
  * tip once, then drains it in `maxBlocksPerBatch`-sized batches.
  */
case class EthBlockOffset(block: Long) extends Offset {
  override def json(): String = block.toString
}

class EthereumMicroBatchStream(kind: EthSchemas.TableKind, chainDir: String,
    schema: org.apache.spark.sql.types.StructType, blocksPerPartition: Int,
    startBlock: Long, maxBlocksPerBatch: Long, lagBlocks: Long)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  @transient private lazy val client = EthClient.forChain(chainDir)

  /** Visible tip (lag applied); pinned by prepareForTriggerAvailableNow. */
  private def visibleTip(): Long = client.blockNumber() - lagBlocks
  private var pinnedTip: Option[Long] = None
  private def cap: Long = pinnedTip.getOrElse(visibleTip())

  override def prepareForTriggerAvailableNow(): Unit = pinnedTip = Some(visibleTip())

  override def initialOffset(): Offset = EthBlockOffset(startBlock - 1)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[EthBlockOffset].block
    EthBlockOffset(math.max(s, math.min(cap, s + maxBlocksPerBatch)))
  }

  override def reportLatestOffset(): Offset = EthBlockOffset(cap)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[EthBlockOffset].block + 1
    val e = end.asInstanceOf[EthBlockOffset].block
    if (s > e) Array.empty
    else Iterator.range(s, e + 1, blocksPerPartition.toLong)
      .map(p => EthereumInputPartition(p, math.min(e, p + blocksPerPartition - 1)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EthereumReaderFactory(kind, chainDir, schema)

  override def deserializeOffset(json: String): Offset = EthBlockOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
