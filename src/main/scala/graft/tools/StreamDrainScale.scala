package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Streaming-drain throughput at chain scale: run the tip-following
  * ethereum micro-batch source over the ~1M-block evidence chain under
  * `Trigger.AvailableNow` and measure end-to-end drain wall, batch count,
  * and blocks/s — the catch-up cost a deployment pays when a stream
  * starts from genesis (the reference connector has no streaming at all;
  * its answer to catch-up is a full batch re-read per query).
  *
  * Row-count integrity is asserted from the query progress (sum of
  * numInputRows must equal the chain length minus the lag window) — the
  * same offsets-are-gap-free contract the StreamingSpec soak pins, here
  * at 3 orders of magnitude more blocks.
  *
  * One-off measurement main; results recorded in COVERAGE.md per round.
  */
object StreamDrainScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val blocks = sys.env.getOrElse("SPARK_GRAFT_CHAIN_BLOCKS", "1000000").toLong
    val batchSize = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCH", "16384").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_CHAIN",
      s"${System.getProperty("java.io.tmpdir")}/graft-eth-scale")
    graft.sources.eth.EthFixtures.ensureChainOnly(dir, blocks)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-drain-ckpt").toString

    val t0 = System.nanoTime()
    val q = spark.readStream.format("ethereum")
      .option("table", "block").option("chain", dir)
      .option("maxBlocksPerBatch", batchSize.toString)
      .load()
      .select("block_number")
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(600000)
    val wall = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress
    val rows = progress.map(_.numInputRows).sum
    val batches = progress.count(_.numInputRows > 0)
    q.stop()

    println(s"\n| chain | drained rows | batches (x$batchSize) | wall | blocks/s |")
    println("|---|---|---|---|---|")
    println(f"| $blocks blocks | $rows | $batches | $wall%.1fs | ${rows / wall}%.0f |")
    assert(rows == blocks,
      s"drain integrity: $rows rows != $blocks chain blocks")
    spark.stop()
  }
}
