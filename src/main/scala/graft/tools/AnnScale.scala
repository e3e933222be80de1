package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Expressions
import graft.operators.{IvfIndex, Similarity}

/** ANN evidence at vector-store scale (round-7 review item 4): build the
  * persisted IVF index over ~1M synthetic vectors (2000× the sf0.01
  * corpus, 60× the StressSpec sweep) and measure what the plans only
  * promise — index build wall, per-query wall at several probe depths,
  * and recall@5 against exact brute force on the same corpus.
  *
  * The corpus is generated deterministically (hash→sin expressions, no
  * RNG state) with latent cluster structure — `Latent` centers + 25%
  * noise — so coarse quantization has real structure to find and recall
  * is a meaningful number rather than a uniform-cloud coin flip. Ground
  * truth is exact brute-force top-k over all N vectors for `Queries`
  * probe vectors (the one deliberate all-pairs pass — it IS the oracle).
  *
  * One-off measurement main (`sbt "runMain graft.tools.AnnScale"`);
  * results are recorded in COVERAGE.md per round. Correctness of the IVF
  * operator itself is the nd_knn_ivf oracle row; StressSpec/PlanAuditSpec
  * pin its plan shapes.
  */
object AnnScale {
  private val Dim = 64
  private val Latent = 128
  private val Queries = 50
  private val K = 5

  private def timeSec(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_ANN_VECS", "1000000").toLong
    val nLists = sys.env.getOrElse("SPARK_GRAFT_ANN_LISTS", "256").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = sys.env.getOrElse("SPARK_GRAFT_ANN_DIR",
      s"${System.getProperty("java.io.tmpdir")}/graft-ann-scale-$n")
    val marker = java.nio.file.Paths.get(dir, "_SUCCESS_VECS")
    if (!java.nio.file.Files.exists(marker)) {
      val gen = timeSec {
        spark.range(n).select(
          $"id".as("vec_id"),
          transform(sequence(lit(0), lit(Dim - 1)), j =>
            (sin(hash(pmod($"id", lit(Latent)), j)) +
             sin(hash($"id", j, lit(7))) * lit(0.25)).cast("float"))
            .as("embedding"),
          pmod($"id", lit(Latent)).cast("int").as("label"))
          .repartition(cpus.toInt)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      }
      java.nio.file.Files.write(marker, Array.emptyByteArray)
      System.err.println(f"[ann-scale] generated $n vectors x $Dim in $gen%.1fs -> $dir")
    }

    val indexDir = s"$dir/ivf"
    val tBuild = timeSec { IvfIndex.build(spark, dir, indexDir, nLists = nLists) }
    System.err.println(f"[ann-scale] IVF build ($nLists lists): $tBuild%.1fs")

    // probe vectors: a deterministic 1-in-(n/Queries) comb over the corpus
    val stride = n / Queries
    def vecs: DataFrame = graft.Tables.embeddings(spark, dir)
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    val queries = vecs.filter($"vec_id" % stride === 17)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val qLocal = spark.createDataFrame(
      java.util.Arrays.asList(queries.collect(): _*), queries.schema)

    // exact ground truth: the one deliberate all-pairs pass (the oracle)
    var truth: Array[(Long, Long)] = null
    val tBrute = timeSec {
      val cand = vecs.crossJoin(broadcast(qLocal))
        .filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id".as("neighbor_id"),
                Expressions.cosineSim($"qv", $"v").as("sim"))
      truth = Similarity.rankWithin(cand, K)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    }
    val truthSet = truth.toSet
    System.err.println(f"[ann-scale] brute-force truth ($Queries queries): $tBrute%.1fs")

    println(s"\n| path | wall ($Queries queries) | per-query | recall@$K |")
    println("|---|---|---|---|")
    println(f"| brute force (exact) | $tBrute%.1fs | ${tBrute / Queries}%.2fs | 1.000 |")
    Seq(4, 8, 16).foreach { nProbe =>
      var got: Array[(Long, Long)] = null
      val t = timeSec {
        got = IvfIndex.query(spark, indexDir, qLocal, k = K, nProbe = nProbe)
          .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      }
      val recall = got.count(truthSet.contains).toDouble / truth.length
      println(f"| ivf nProbe=$nProbe | $t%.1fs | ${t / Queries}%.2fs | $recall%.3f |")
    }
    println(f"\n($n vectors x $Dim float, $nLists lists, IVF build $tBuild%.1fs, local[$cpus])")

    // incremental-ingest path: a 10% batch appended against the FROZEN
    // quantizer (no retrain), then the same queries against the extended
    // index vs extended brute truth — the ivf_incr/append contract at 1M
    val batchN = n / 10
    val batch = spark.range(n, n + batchN).select(
      $"id".as("vec_id"),
      transform(sequence(lit(0), lit(Dim - 1)), j =>
        sin(hash(pmod($"id", lit(Latent)), j)).cast("double") +
        sin(hash($"id", j, lit(7))).cast("double") * lit(0.25)).as("v"))
    val tAppend = timeSec { IvfIndex.append(spark, indexDir, batch) }
    val extVecs = vecs.unionByName(batch)
    var truth2: Array[(Long, Long)] = null
    val tBrute2 = timeSec {
      val cand = extVecs.crossJoin(broadcast(qLocal))
        .filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id".as("neighbor_id"),
                Expressions.cosineSim($"qv", $"v").as("sim"))
      truth2 = Similarity.rankWithin(cand, K)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    }
    val truth2Set = truth2.toSet
    var got2: Array[(Long, Long)] = null
    val tQ2 = timeSec {
      got2 = IvfIndex.query(spark, indexDir, qLocal, k = K, nProbe = 8)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    }
    val recall2 = got2.count(truth2Set.contains).toDouble / truth2.length
    println(f"\n| append $batchN (frozen quantizer) | query after append (nProbe=8) | recall@$K vs extended brute ($tBrute2%.1fs) |")
    println("|---|---|---|")
    println(f"| ${tAppend}%.1fs | $tQ2%.1fs | $recall2%.3f |")
    spark.stop()
  }
}
