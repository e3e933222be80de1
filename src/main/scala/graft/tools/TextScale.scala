package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Order-of-magnitude evidence for the TEXT/RETRIEVAL families (round-8
  * review item 5): dedup, ANN, the chain source, and the stream drain
  * have 1M–10M measurements; BM25, TF-IDF, BPE-apply, and the NB
  * classifier did not. This tool runs those four registry pipelines
  * VERBATIM over a ~1M-document synthetic corpus (the DedupScale
  * generator shape, extended with the documents-table metadata columns)
  * and records wall time plus PLAN-SHAPE STABILITY: each op's canonical
  * fingerprint ([[PlanFingerprints.canonical]]) at 1M docs must equal its
  * fingerprint at the sf0.1 oracle corpus — a broadcast flipping to a
  * nested loop or a keyed window collapsing to a single partition at
  * 200× the corpus is exactly the regression this exists to catch.
  *
  * One-off measurement main; results recorded in COVERAGE.md per round.
  * Correctness of the operators is their oracle rows; this is the
  * does-the-shape-survive-scale half.
  *
  * Usage: `runMain graft.tools.TextScale` (env `SPARK_GRAFT_TEXT_DOCS`,
  * `SPARK_GRAFT_TEXT_DIR`, `SPARK_GRAFT_CPUS`).
  */
object TextScale {
  private val Words = 60
  private val Vocab = 5000

  private def timeSec(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_TEXT_DOCS", "1000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = sys.env.getOrElse("SPARK_GRAFT_TEXT_DIR",
      s"${System.getProperty("java.io.tmpdir")}/graft-text-scale-$n")
    val marker = java.nio.file.Paths.get(dir, "_SUCCESS_DOCS")
    if (!java.nio.file.Files.exists(marker)) {
      // deterministic hash→word corpus (DedupScale's shape) + the
      // documents-table metadata the text family reads: lang mildly
      // skewed over six values (four at 20%, two at 10% — a classifier
      // label with mass everywhere), source uniform over ten
      val langs = Seq("en", "de", "fr", "es", "pt", "it")
      val gen = timeSec {
        spark.range(n).select(
          $"id".as("doc_id"),
          concat_ws(" ", transform(sequence(lit(0), lit(Words - 1)), j =>
            concat(lit("w"), pmod(hash($"id", j), lit(Vocab))))).as("text"),
          element_at(
            typedLit(langs), (pmod(hash($"id", lit(-1)), lit(10)).cast("int") % langs.size) + 1
          ).as("lang"),
          concat(lit("s"), pmod(hash($"id", lit(-2)), lit(10))).as("source"))
          .withColumn("n_chars", length($"text").cast("long"))
          .repartition(cpus.toInt)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      }
      java.nio.file.Files.write(marker, Array.emptyByteArray)
      System.err.println(f"[text-scale] generated $n docs in $gen%.1fs -> $dir")
    }
    spark.read.parquet(s"$dir/documents.parquet").count() // warm page cache

    // PRE-materialization pipelines (the registry functions detach — the
    // returned frame is a local/cached relation whose plan says nothing);
    // construction + count is the real pipeline cost, including the BPE
    // merge-learning loop that runs during construction
    val baseSf = "/root/testdata/sf0.1"
    val ops: Seq[(String, String => (DataFrame, () => Unit))] = Seq(
      ("nd_rag_bm25",
        d => graft.operators.Similarity.bm25RetrieveLazy(spark, d, 5, 6, 10)),
      ("nd_text_tfidf",
        d => graft.operators.TextAnalysis.tfidfKeywordsLazy(spark, d, 3)),
      ("nd_bpe_apply",
        d => graft.operators.TextAnalysis.bpeApplyLazy(spark, d, 8)),
      ("nd_text_nb_classifier",
        d => graft.operators.TextAnalysis.nbClassifyLazy(spark, d)))

    println(s"\n| op | corpus | wall | rows out | shape vs sf0.1 |")
    println("|---|---|---|---|---|")
    var flips = 0
    ops.foreach { case (name, build) =>
      val (baseDf, baseFree) = build(baseSf)
      val fpBase = PlanFingerprints.canonical(baseDf.queryExecution.executedPlan)
      baseFree()
      var rows = 0L
      var fpBig = ""
      val wall = timeSec {
        val (big, free) = build(dir)
        fpBig = PlanFingerprints.canonical(big.queryExecution.executedPlan)
        rows = big.count()
        free()
      }
      val same = fpBase == fpBig
      if (!same) {
        flips += 1
        System.err.println(s"[text-scale] $name SHAPE FLIP:\n  sf0.1: $fpBase\n  1M:    $fpBig")
      }
      println(f"| $name | $n docs | $wall%.1fs | $rows | ${if (same) "identical" else "FLIP"} |")
    }
    spark.stop()
    if (flips > 0) sys.exit(1)
  }
}
