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
  * Row-count integrity is asserted from a `StreamingQueryListener` that
  * accumulates `numInputRows` across EVERY progress event (the round-8
  * review caught the first draft summing `recentProgress`, which retains
  * only the last `numRecentProgressUpdates` (default 100) entries — a
  * smaller batch size or longer chain silently undercounted). The total
  * must equal the chain length — the same offsets-are-gap-free contract
  * the StreamingSpec soak pins, here at 3 orders of magnitude more
  * blocks — and a drain that times out is reported as a timeout, not as
  * a row mismatch.
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
    val ckpt = TmpDirs.tmpDirCleaned("graft-drain-ckpt")

    // every progress event, not the bounded recentProgress ring buffer
    val totalRows = new java.util.concurrent.atomic.AtomicLong(0)
    val totalBatches = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        totalRows.addAndGet(e.progress.numInputRows)
        if (e.progress.numInputRows > 0) totalBatches.incrementAndGet()
        ()
      }
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

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
    val finished = q.awaitTermination(600000)
    assert(finished, s"drain TIMED OUT after 600s — not a row-integrity failure")
    val wall = (System.nanoTime() - t0) / 1e9
    q.stop()
    // progress events ride the async listener bus; wait (bounded) for the
    // final batch's event before reading the totals
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (totalRows.get() != blocks && System.nanoTime() < deadline)
      Thread.sleep(100)
    spark.streams.removeListener(listener)
    val rows = totalRows.get()
    val batches = totalBatches.get()

    println(s"\n| chain | drained rows | batches (x$batchSize) | wall | blocks/s |")
    println("|---|---|---|---|---|")
    println(f"| $blocks blocks | $rows | $batches | $wall%.1fs | ${rows / wall}%.0f |")
    assert(rows == blocks,
      s"drain integrity: $rows rows != $blocks chain blocks")

    // ---- streaming drift monitor at the 1M-doc corpus (round-9 review
    // item 8: the one stateful stream without an order-of-magnitude
    // number). Runs the REGISTRY pipeline (StreamQueries.streamDrift)
    // verbatim over the TextScale corpus; state must stay |dims×buckets|
    // rows no matter the corpus size — that bound, not the wall, is the
    // scale claim, so both are printed from the state-operator metrics.
    val docsDir = sys.env.getOrElse("SPARK_GRAFT_DRIFT_DOCS",
      s"${System.getProperty("java.io.tmpdir")}/graft-text-scale-1000000")
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(docsDir, "_SUCCESS_DOCS"))) {
      val nDocs = spark.read.parquet(s"$docsDir/documents.parquet").count()
      val stateRows = new java.util.concurrent.atomic.AtomicLong(0)
      val stateBytes = new java.util.concurrent.atomic.AtomicLong(0)
      val dl = new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
          val ops = e.progress.stateOperators
          if (ops.nonEmpty) {
            stateRows.set(ops.map(_.numRowsTotal).sum)
            stateBytes.set(ops.map(_.memoryUsedBytes).sum)
          }
        }
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      }
      spark.streams.addListener(dl)
      // first call pays the one-off parity-split write (harness plumbing,
      // cached per (app, dir)); the second call is the honest drain wall
      graft.operators.StreamQueries.streamDrift(spark, docsDir).collect()
      val tD = System.nanoTime()
      val psi = graft.operators.StreamQueries.streamDrift(spark, docsDir).collect()
      val wallD = (System.nanoTime() - tD) / 1e9
      // the round-10 advice: a fixed sleep races the async listener bus
      // (the same class of flake the round-8 review found in
      // MemoryPressure) — drain the bus instead (streaming progress
      // events ride the SparkContext listener bus; `listenerBus` /
      // `waitUntilEmpty` are private[spark] in Scala but public in
      // bytecode), then poll briefly until a stateful progress event has
      // actually been DELIVERED, with the old sleep as the fallback
      try {
        val bus = classOf[org.apache.spark.SparkContext]
          .getMethod("listenerBus").invoke(spark.sparkContext)
        bus.getClass.getMethod("waitUntilEmpty", classOf[Long])
          .invoke(bus, java.lang.Long.valueOf(10000L))
        val deadline = System.nanoTime() + 10000000000L
        while (stateRows.get == 0L && System.nanoTime() < deadline)
          Thread.sleep(50)
      } catch { case _: Throwable => Thread.sleep(2000) }
      spark.streams.removeListener(dl)
      println(s"\n| drift corpus | psi rows | state rows | state bytes | drain wall |")
      println("|---|---|---|---|---|")
      println(f"| $nDocs docs | ${psi.length} | ${stateRows.get} | ${stateBytes.get} | $wallD%.1fs |")
      assert(psi.nonEmpty && stateRows.get <= 64L,
        s"drift state must stay dims x buckets-bounded, got ${stateRows.get} rows")
    } else System.err.println(
      s"[drain-scale] $docsDir missing — run graft.tools.TextScale first; drift block skipped")
    spark.stop()
  }
}
