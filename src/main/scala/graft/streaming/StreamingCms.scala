package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Streaming COUNT-MIN sketch: heavy-hitter counting maintained over a
  * document stream with BOUNDED state — the streaming-legal form of
  * corpus-scale token counting. A per-token streaming count would hold one
  * state row per distinct token (unbounded as the vocabulary grows); the
  * sketch holds exactly depth × width cells forever, and cell counts are
  * sums, so they merge across micro-batches by construction.
  *
  * The hash family is [[TextAnalysis.cmsBucket]] — identical to the batch
  * audit's — so a stream processed to completion yields EXACTLY the batch
  * sketch cells (spec-proven), and the same min-over-rows estimate serves
  * queries against either. Architecture mirrors [[StreamingDedup]]:
  * tokenize + bucket are pure per-row expressions; the cell count is the
  * single stateful aggregate.
  */
object StreamingCms {

  /** `docStream` (streaming, columns `doc_id`, `text`) → the live sketch
    * cells `(j, b, c)`. Run with complete/update output mode; state is
    * depth×width rows regardless of stream volume. */
  def cmsStream(docStream: DataFrame, width: Int = 1024,
      depth: Int = 4): DataFrame = {
    val s = docStream.sparkSession
    import s.implicits._
    docStream
      .select(explode(TextAnalysis.wsTokens(TextAnalysis.canonical($"text"))).as("token"))
      .filter($"token" =!= "")
      .select(posexplode(array((0 until depth).map(j =>
        TextAnalysis.cmsBucket(j, $"token", width)): _*)).as(Seq("j", "b")))
      .groupBy($"j", $"b").agg(count(lit(1)).as("c"))
  }

  /** Point estimate for `token` against materialized cells — min over the
    * sketch rows of the token's cell count (the CMS read path). The
    * buckets are computed driver-side with the same md5-fold the
    * expressions use (`md5("cms<j>|<token>")`, first 7 hex digits). */
  def estimate(cells: DataFrame, token: String, width: Int = 1024,
      depth: Int = 4): Long = {
    val s = cells.sparkSession
    import s.implicits._
    val pairs = (0 until depth).map { j =>
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cms$j|$token".getBytes("UTF-8"))
      val hex = digest.map("%02x".format(_)).mkString.substring(0, 7)
      (j, java.lang.Long.parseLong(hex, 16) % width)
    }
    // LEFT join from the token's bucket rows: a cell the stream never
    // incremented is absent from `cells`, and a true CMS reads it as 0.
    // An inner join would drop the zero cells — over-estimating tokens
    // with partially-unpopulated buckets and NPE-ing on fully-unseen ones.
    cells.join(s.createDataset(pairs).toDF("j", "b"), Seq("j", "b"), "right")
      .agg(min(coalesce($"c", lit(0L)))).collect()(0).getLong(0)
  }
}
