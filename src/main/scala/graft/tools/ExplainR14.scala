package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Round-14 optimization evidence: writes `plans/r14/<query>_<suffix>.txt`
  * with the `.explain("formatted")` output of each named query — the
  * before/after plan files the optimization notes point at.
  *
  * Detach-materialized queries (PageRank, k-core, the LM score…) return a
  * LocalRelation from the registry entry; for those the dump substitutes
  * the pre-materialization pipeline (the exact frame the query executes
  * before collecting), same convention as [[DumpPlans]].
  *
  * Usage: `runMain graft.tools.ExplainR14 <sfDir> <suffix> <name> [name…]`.
  */
object ExplainR14 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.eth.EthFixtures.ensure(spark)
    import spark.implicits._

    /** Pre-materialization variants for queries whose registry entry
      * returns a LocalRelation (the plan a reviewer needs is the pipeline
      * that ran, not the collected result). */
    def lazyVariant(n: String): Option[org.apache.spark.sql.DataFrame] = n match {
      case "eth_q17_pagerank" =>
        Some(graft.operators.EthQueries.q17PageRankLazy(spark, sfDir)._1)
      case "eth_q18_triangles" =>
        Some(graft.operators.EthQueries.q18TrianglesLazy(spark, sfDir)._1)
      case "eth_q37_kcore" =>
        Some(graft.operators.EthQueries.q37KCoreLazy(spark, sfDir)._1)
      case "nd_text_lm_score" =>
        Some(graft.operators.TextAnalysis.trigramLmScoreLazy(spark, sfDir, 5000)._1)
      case "nd_vocab_cms" =>
        Some(graft.operators.TextAnalysis.vocabCmsLazy(spark, sfDir, 30, 1024, 4)._1)
      case _ => None
    }

    Files.createDirectories(Paths.get("plans/r14"))
    names.foreach { n =>
      val df = lazyVariant(n).getOrElse(SparkEntry.queries(n)(spark, sfDir))
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(s"plans/r14/${n}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"wrote plans/r14/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
