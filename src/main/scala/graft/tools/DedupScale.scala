package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** MinHash-LSH dedup evidence at corpus scale (the round-8 companion to
  * AnnScale): run the exact nd_dedup_minhash pipeline — native signature
  * expression, banded (band, key) equi-join, slot-equality verification —
  * over ~1M synthetic documents with PLANTED near-duplicates, and measure
  * wall time, candidate volume, and planted-pair recall.
  *
  * The corpus is deterministic (hash→word expressions, no RNG state):
  * 60-word documents over a 5000-word vocabulary. Every 20th document of
  * the first half is replicated into the second half with its LAST word
  * changed (ids a and a+500000), leaving 51 of ~56+5 distinct 5-shingles
  * shared — true Jaccard ≈ 0.84, comfortably above the 0.5 threshold, so
  * every planted pair SHOULD be found; unplanted pairs share no shingles
  * beyond vocabulary coincidence. Recall here is a measured property of
  * the real pipeline at 1M docs, not a spec-sized extrapolation.
  *
  * One-off measurement main (`sbt "runMain graft.tools.DedupScale"`);
  * results recorded in COVERAGE.md per round. Correctness of the operator
  * is the nd_dedup_minhash oracle row; plan shapes are pinned by
  * PlanAuditSpec/StressSpec.
  */
object DedupScale {
  private val Words = 60
  private val Vocab = 5000
  private val PlantStride = 20

  private def timeSec(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_DEDUP_DOCS", "1000000").toLong
    val half = n / 2
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = sys.env.getOrElse("SPARK_GRAFT_DEDUP_DIR",
      s"${System.getProperty("java.io.tmpdir")}/graft-dedup-scale-$n")
    val marker = java.nio.file.Paths.get(dir, "_SUCCESS_DOCS")
    if (!java.nio.file.Files.exists(marker)) {
      // seed = the base document this row's text derives from; planted
      // copies (second half, every PlantStride-th) reuse their base's seed
      // for all words except the last
      val seed = when($"id" >= half && ($"id" - half) % PlantStride === 0,
        $"id" - half).otherwise($"id")
      val gen = timeSec {
        spark.range(n).select(
          $"id".as("doc_id"),
          concat_ws(" ", transform(sequence(lit(0), lit(Words - 1)), j =>
            concat(lit("w"), pmod(hash(
              when(j === Words - 1, $"id").otherwise(seed), j), lit(Vocab)))))
            .as("text"))
          .repartition(cpus.toInt)
          .write.mode("overwrite").parquet(s"$dir/docs.parquet")
      }
      java.nio.file.Files.write(marker, Array.emptyByteArray)
      System.err.println(f"[dedup-scale] generated $n docs x $Words words in $gen%.1fs -> $dir")
    }

    def docs: DataFrame = spark.read.parquet(s"$dir/docs.parquet")
    docs.count() // warm page cache so the timed pass measures the pipeline

    var pairs: DataFrame = null
    var nPairs = 0L
    val t = timeSec {
      pairs = Dedup.minhashPairsFrom(
        docs.select($"doc_id", Dedup.minhashSignature($"text").as("sig")),
        threshold = 0.5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      nPairs = pairs.count()
    }
    val planted = half / PlantStride
    val found = pairs
      .filter($"doc_b" - $"doc_a" === half && $"doc_a" % PlantStride === 0)
      .count()
    val spurious = nPairs - found
    pairs.unpersist(blocking = false)

    println(s"\n| corpus | pipeline wall | pairs found | planted | planted recall | spurious |")
    println("|---|---|---|---|---|---|")
    println(f"| $n docs x $Words words | $t%.1fs | $nPairs | $planted | ${found.toDouble / planted}%.4f | $spurious |")
    println(f"\n(nd_dedup_minhash pipeline verbatim: ${Dedup.NumHashes} hashes, ${Dedup.Bands} bands, threshold 0.5, local[$cpus])")
    spark.stop()
  }
}
