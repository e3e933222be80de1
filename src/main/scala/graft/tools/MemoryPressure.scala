package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Memory-scarcity gate (round-7 review item 2): run the expensive end of
  * the registry under a deliberately starved memory manager and prove the
  * plans SPILL AND FINISH instead of failing — the execution-time half of
  * "would this survive 100×" that plan-shape audits cannot show.
  *
  * Starvation knobs (all public Spark):
  *  - `spark.testing.memory=512m`-equivalent: the UnifiedMemoryManager
  *    sizes its pools from this figure instead of the real heap, so
  *    execution+storage memory is (512M − 300M reserved) × fraction ≈
  *    42 MB across 8 cores — far below the working set of the heavy
  *    aggregates/joins at sf0.01, forcing spill paths without risking a
  *    real driver OOM (the actual heap stays large).
  *  - `spark.memory.fraction=0.2`, 8 shuffle partitions (bigger
  *    per-partition working sets → more pressure per task).
  *
  * A listener accumulates `memoryBytesSpilled`/`diskBytesSpilled` across
  * task ends; the gate demands (a) zero query failures and (b) nonzero
  * total spill — if nothing spilled, the run proved nothing and exits 1.
  * Output: one JSON line per query (seconds + spill deltas) and a summary
  * line, recorded in COVERAGE.md per round.
  *
  * Usage: `sbt "runMain graft.tools.MemoryPressure [sfDir]"`.
  */
object MemoryPressure {

  /** The registry's heavy hitters: every family with a corpus-scale
    * shuffle, sort, window, iterative loop, or build side — plus (round
    * 9) the stateful STREAMING drains, whose state stores and per-batch
    * shuffles had no scarcity evidence before: the drained micro-batch
    * engine must also spill-and-finish, not OOM, when execution memory
    * is ~24 MB. */
  val heavyQueries: Seq[String] = Seq(
    "nd_dedup_minhash", "nd_dedup_simhash", "nd_dedup_ngram_jaccard",
    "nd_dedup_semantic", "nd_dedup_substring", "nd_dedup_clusters",
    "nd_knn_brute", "nd_knn_ivf", "nd_knn_pq", "nd_rag_bm25",
    "nd_rag_hybrid", "nd_bpe_learn", "nd_bpe_apply", "nd_text_tfidf",
    "nd_text_pmi", "nd_pipeline_packing", "nd_pipeline_curation",
    "q41_salted_join", "q42_bucketed_join", "q38_kmv_distinct",
    "q21_approx_agg", "eth_q17_pagerank", "eth_q19_components",
    "eth_q22_taint", "eth_q4_erc20_movement", "nd_events_percentiles",
    "nd_stream_cms", "nd_stream_dedup", "nd_stream_join",
    "nd_stream_ann", "nd_stream_session", "nd_stream_percentiles",
    // round-9 batch 2: the containment candidate join, the payload-free
    // setsim self-join, and the chunked trailing-window median
    "nd_dedup_containment", "nd_join_setsim",
    "nd_events_moving_median_scalable",
    // round 10: the OR-blocked fuzzy join (two candidate self-joins +
    // pair dedup), the new drained stateful chi2 stream, and McNemar's
    // paired classifier join (lang-id scan ⋈ NB train/score pipeline)
    "nd_join_fuzzy", "nd_stream_chi2", "nd_eval_mcnemar",
    // round 11: the unigram-LM tokenizer (per-distinct-word Viterbi
    // against a broadcast cost map — the distinct-word shuffle and the
    // corpus join-back are the pressure points) and the real-PNG decode
    // (mapPartitions kernel holding decoded rasters)
    "nd_tok_unigram", "nd_multimodal_decode",
    // round 11 batch 2: the positional phrase index (corpus-token explode
    // + alignment group-by), the WordPiece twin of the unigram shuffle,
    // the SCD2 user windows + version aggregate and its stateful
    // streaming drain, and the full-outer snapshot-digest diff join
    "nd_search_phrase", "nd_tok_wordpiece", "nd_events_scd2",
    "nd_stream_scd2", "nd_pipeline_diff",
    // round 12: the frozen-quantizer health scan (per-row argmax over the
    // centroid literal + the two-level integral aggregate), the HTML
    // extraction map pass (page build + strip + line lambdas per row),
    // and the documents Z-manifest (en-score scan + bounds crossJoin)
    "nd_knn_ivf_health", "nd_text_extract", "nd_doc_zorder",
    // round 12 batch 2: the grid-bucketized interval-overlap join, the
    // two-stage SQ8→exact rerank, the sweep-line boundary prefix sum and
    // its stateful streaming drain, the frozen-vocab coverage annotate
    // join, the k-core peel (round-iterated degree agg + two semi-joins),
    // the watermark late-data drain, and the two events-table planning
    // aggregates (per-key skew counts; state+delta MV merge)
    "nd_join_interval", "nd_rag_rerank", "nd_events_concurrency",
    "nd_stream_concurrency", "nd_tok_coverage", "eth_q37_kcore",
    "nd_stream_late", "nd_join_skew_plan", "nd_pipeline_incr_agg",
    // round 13: the graph-ANN build (multi-assign candidate join + degree
    // windows + per-hop broadcast expansions), the ten-stage curation
    // chain (every survivor checkpoint + the mid-chain DSIR/minhash
    // shuffles under scarcity), the codec kernels (decoded rasters /
    // PCM buffers held per task), and the reorg-correcting mirror's
    // stream + reconcile loop
    "nd_knn_graph", "nd_pipeline_e2e", "nd_multimodal_jpeg",
    "nd_multimodal_audio", "eth_stream_mirror", "nd_knn_graph_health")

  /** Drain the async listener bus so per-query spill deltas attribute
    * deterministically (the round-8 review flagged the fixed sleep: a
    * loaded bus can deliver a query's task-end events after the
    * snapshot). `SparkContext.listenerBus` and `waitUntilEmpty` are
    * `private[spark]` in Scala but public in bytecode (Spark's own test
    * suites call them the same way); falls back to the old sleep if the
    * reflective path ever breaks. */
  private def drainListenerBus(spark: SparkSession): Unit =
    try {
      val bus = classOf[org.apache.spark.SparkContext]
        .getMethod("listenerBus").invoke(spark.sparkContext)
      bus.getClass.getMethod("waitUntilEmpty", classOf[Long])
        .invoke(bus, java.lang.Long.valueOf(10000L))
      ()
    } catch {
      case _: Throwable => Thread.sleep(300)
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val spark = SparkSession.builder()
      .master("local[8,4]")
      .appName("graft-memory-pressure")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the starvation: the memory manager believes the JVM has 96 MB with
      // a 16 MB reserve — execution+storage ≈ 24 MB across 8 cores, far
      // below the sf0.1 working sets (both confs are public knobs from the
      // Spark source, used by Spark's own memory-manager suites)
      .config("spark.testing.memory", (96L * 1024 * 1024).toString)
      .config("spark.testing.reservedMemory", (16L * 1024 * 1024).toString)
      .config("spark.memory.fraction", "0.3")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val memSpilled = new AtomicLong(0)
    val diskSpilled = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpilled.addAndGet(m.memoryBytesSpilled)
          diskSpilled.addAndGet(m.diskBytesSpilled)
        }
      }
    })

    graft.sources.eth.EthFixtures.ensure(spark)
    var failures = 0
    val rows = heavyQueries.map { name =>
      val (m0, d0) = (memSpilled.get(), diskSpilled.get())
      val t0 = System.nanoTime()
      val ok = try {
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        true
      } catch {
        case e: Throwable =>
          System.err.println(s"[mem] $name FAILED: ${e.getMessage}")
          failures += 1; false
      }
      val dt = (System.nanoTime() - t0) / 1e9
      drainListenerBus(spark) // deterministic: task-end events attributed to THIS query
      val (dm, dd) = (memSpilled.get() - m0, diskSpilled.get() - d0)
      System.err.println(f"[mem] $name%-26s ${dt}%7.2fs  spill mem=${dm / 1048576}%5dMB disk=${dd / 1048576}%5dMB ${if (ok) "" else "FAILED"}")
      s"""{"query":"$name","sec":$dt,"mem_spilled_mb":${dm / 1048576},"disk_spilled_mb":${dd / 1048576},"ok":$ok}"""
    }
    drainListenerBus(spark)
    val summary = s"""{"metric":"memory_pressure","queries":${rows.length},""" +
      s""""failures":$failures,"mem_spilled_mb":${memSpilled.get() / 1048576},""" +
      s""""disk_spilled_mb":${diskSpilled.get() / 1048576},"sf":"$sfDir"}"""
    println(rows.mkString("[", ",\n", "]"))
    println(summary)
    sys.env.get("SPARK_GRAFT_MEM_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (rows.mkString("[", ",\n", "]") + "\n" + summary + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
    // the gate: everything finished AND the starvation genuinely bit
    if (failures > 0) sys.exit(1)
    if (memSpilled.get() == 0 && diskSpilled.get() == 0) {
      System.err.println("[mem] nothing spilled — starvation did not bite; gate proves nothing")
      sys.exit(1)
    }
  }
}
