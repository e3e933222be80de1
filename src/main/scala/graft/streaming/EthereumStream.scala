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
  * been processed. Reorg/finality handling is out of scope (documented
  * SURVEY §7 risk) — a production source would hold offsets `finality`
  * blocks behind tip; the `lagBlocks` option models exactly that.
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
