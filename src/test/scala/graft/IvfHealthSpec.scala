package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** IVF index health ([[Similarity.ivfHealth]]): accounting invariants on
  * the real corpus plus matched positive/negative drift controls on
  * doctored corpora (the quantizer is trained on `vec_id < cut` only, so
  * doctoring the appended half never moves the centroids). */
class IvfHealthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("health manifest accounting: counts, shares, alarm composition") {
    import spark.implicits._
    val rows = Similarity.ivfHealth(spark, sf).collect()
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == nVecs,
      "per-list counts must partition the corpus")
    val shares = rows.map(_.getLong(5)).sum
    assert(shares <= 1000000L && shares > 1000000L - rows.length,
      s"shares must sum to 1e6 minus truncation: $shares")
    rows.foreach { r =>
      assert(r.getBoolean(8) == (r.getBoolean(6) || r.getBoolean(7)),
        "retrain must be exactly skew OR drift")
    }
    // the alarm columns are global — identical on every row
    assert(rows.map(r => (r.getBoolean(6), r.getBoolean(7))).distinct.length == 1)
  }

  /** Build a corpus whose appended half (`vec_id >= cut`) is `f` applied
    * to the base half; the base half is byte-identical, so the frozen
    * quantizer is too. */
  private def doctored(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivfhealth").toString
    val base = Tables.embeddings(spark, sf).filter($"vec_id" < 250)
    val appended = base.select(($"vec_id" + 250).as("vec_id"),
      f($"embedding").as("embedding"), $"label")
    base.unionByName(appended).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("negative control: an appended batch copied from the corpus raises no drift") {
    val dir = doctored(identity)
    val rows = Similarity.ivfHealth(spark, dir).collect()
    // identical vectors assign to identical lists with identical sims:
    // per-list base and new means are equal, global gap is 0
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(4),
        s"list ${r.getLong(0)}: copied batch changed the mean sim")
      assert(!r.getBoolean(7), "drift alarm on a distribution-identical batch")
    }
  }

  test("positive control: a negated appended batch trips drift and retrain") {
    val dir = doctored(e => transform(e, x => -x))
    val rows = Similarity.ivfHealth(spark, dir).collect()
    assert(rows.forall(_.getBoolean(7)), "negated batch must trip the drift alarm")
    assert(rows.forall(_.getBoolean(8)), "retrain must follow the drift alarm")
  }

  test("persisted-index health equals the inline derivation") {
    import spark.implicits._
    // the physical twin of ivfHealth's cut convention: build (train) on
    // vec_id < 250 only, then append >= 250 under the frozen centroids
    val all = Tables.embeddings(spark, sf)
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    val idx2 = java.nio.file.Files.createTempDirectory("ivfhealth-idx2").toString
    val baseDir = java.nio.file.Files.createTempDirectory("ivfhealth-base").toString
    Tables.embeddings(spark, sf).filter($"vec_id" < 250)
      .coalesce(1).write.mode("overwrite").parquet(s"$baseDir/embeddings.parquet")
    graft.operators.IvfIndex.build(spark, baseDir, idx2, nLists = 16,
      lloydIters = Similarity.DefaultLloydIters)
    graft.operators.IvfIndex.append(spark, idx2, all.filter($"vec_id" >= 250))
    val physical = graft.operators.IvfIndex.health(spark, idx2, cut = 250)
    val inline = Similarity.ivfHealth(spark, sf)
    assert(physical.collect().toSeq == inline.collect().toSeq,
      "persisted-index health diverges from the inline derivation")
  }
}
