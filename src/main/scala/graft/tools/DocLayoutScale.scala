package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Documents-layout measurement at scale (round-11 review item 7): write
  * the corpus twice — source-major (the layout a mixture-reader write
  * naturally produces) and Z-ordered on (source ordinal, en-score micro)
  * via [[graft.plans.Layout.zorderedWrite]] — then measure files-touched
  * for the two scans a text pipeline actually runs: a quality band (the
  * curation filter) and a source slice (the mixture read). Prints one
  * markdown table; results recorded in SURVEY.md §19.
  *
  * Usage: `runMain graft.tools.DocLayoutScale [sfDir] [nFiles]`
  * (defaults /tmp/graft-sf1, 256 — ~10x corpus, file count scaled with it).
  */
object DocLayoutScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf1")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(256)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "28")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val scored = graft.operators.Eval.scoredDocs(spark, sfDir)
      .select(expr("CAST(substr(source, 4) AS BIGINT)").as("src_num"),
              $"score", $"doc_id")
    val dirS = TmpDirs.tmpDirCleaned("docscale-s")
    val dirZ = TmpDirs.tmpDirCleaned("docscale-z")
    scored.repartitionByRange(nFiles, $"src_num", $"doc_id")
      .sortWithinPartitions("src_num", "doc_id")
      .write.mode("overwrite").parquet(dirS)
    graft.plans.Layout.zorderedWrite(scored, "src_num", "score", dirZ, nFiles)
    def hit(dir: String, cond: org.apache.spark.sql.Column): Long =
      spark.read.parquet(dir).filter(cond)
        .select(input_file_name()).distinct().count()
    val med = scored.stat.approxQuantile("score", Array(0.48, 0.52), 0.005)
    val qBand = $"score" >= med(0) && $"score" <= med(1)
    val maxSrc = scored.agg(max($"src_num")).head().getLong(0)
    val sBand = $"src_num" >= maxSrc / 3 && $"src_num" <= maxSrc / 3 + 1
    println(s"| scan | source-major files | z-order files | of $nFiles |")
    println(s"| quality band [${med(0)},${med(1)}] | ${hit(dirS, qBand)} | ${hit(dirZ, qBand)} | $nFiles |")
    println(s"| source slice | ${hit(dirS, sBand)} | ${hit(dirZ, sBand)} | $nFiles |")
    // answers must be layout-invariant
    val a = spark.read.parquet(dirS).filter(qBand)
      .agg(count(lit(1)), sum($"doc_id")).collect()(0)
    val b = spark.read.parquet(dirZ).filter(qBand)
      .agg(count(lit(1)), sum($"doc_id")).collect()(0)
    require(a == b, s"layouts disagree: $a vs $b")
    println(s"| layout-invariance | ${a.getLong(0)} rows both | ok | |")
    spark.stop()
  }
}
