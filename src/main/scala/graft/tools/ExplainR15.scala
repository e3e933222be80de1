package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Round-15 optimization evidence: writes `plans/r15/<query>_<suffix>.txt`
  * with the `.explain("formatted")` output of each named query — the
  * before/after plan files the optimization notes point at.
  *
  * Same conventions as [[ExplainR14]]: detach-materialized queries return
  * a LocalRelation from the registry entry, so the dump substitutes the
  * pre-materialization pipeline (the exact frame that executes before the
  * result collects). Two r15-specific variants:
  *
  *  - `nd_knn_graph` / `nd_knn_graph_health` both ride the index BUILD
  *    (`Similarity.graphBuild`) — the frame this round restructured from
  *    two corpus-pair-scale rank windows to two-level top-k aggregates —
  *    so that is the dumped plan;
  *  - `nd_stream_dedup` is a streaming drain; the dumped plan is
  *    [[graft.streaming.StreamingDedup.dedupStream]] applied to the batch
  *    documents frame (same expression tree as each micro-batch's plan),
  *    which is where the candidate join's broadcast-vs-shuffle shape shows.
  *
  * Usage: `runMain graft.tools.ExplainR15 <sfDir> <suffix> <name> [name…]`.
  */
object ExplainR15 {
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

    def vecs = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))

    def lazyVariant(n: String): Option[org.apache.spark.sql.DataFrame] = n match {
      case "nd_knn_graph" | "nd_knn_graph_health" =>
        val centroids = graft.operators.Similarity.lloydCentroids(
          vecs, 16, graft.operators.Similarity.DefaultLloydIters)
        Some(graft.operators.Similarity.graphBuild(vecs, centroids, 6, 8, 2))
      case "nd_text_lm_score" =>
        Some(graft.operators.TextAnalysis.trigramLmScoreLazy(spark, sfDir, 5000)._1)
      case "nd_stream_dedup" =>
        val docs = graft.Tables.documents(spark, sfDir)
        val store = graft.operators.Dedup.minhashBandStore(
          docs.filter($"doc_id" < 250L))
        Some(graft.streaming.StreamingDedup.dedupStream(
          docs.filter($"doc_id" >= 250L), store, broadcastStore = true))
      case _ => None
    }

    Files.createDirectories(Paths.get("plans/r15"))
    names.foreach { n =>
      val df = lazyVariant(n).getOrElse(SparkEntry.queries(n)(spark, sfDir))
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(s"plans/r15/${n}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"wrote plans/r15/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
