package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Engine-side property audit for the two 100×-gate rows whose DuckDB
  * oracle cannot run at that scale (the recursive-CTE transitive closure
  * OOMs at 76 GB RSS on the 27M-edge near-dup graph — the oracle, not
  * the engine, is the limit; both rows are hash-green at 10× where the
  * closure fits). Instead of trusting the labels, this tool re-derives
  * the cluster assignment on the scale corpus and ASSERTS the invariants
  * that characterize a correct connected-components labeling,
  * distributed (no driver-side graph):
  *
  *  1. EDGE CONSISTENCY — every near-dup pair's endpoints carry the
  *     same cluster label (no under-merge anywhere an edge witnesses).
  *  2. LABEL = MEMBER MINIMUM — each cluster's label equals the minimum
  *     doc_id of its members (the contract every oracle hash depends on).
  *  3. COVERAGE — labels exist for exactly the docs that appear in ≥1
  *     pair (no phantom or dropped nodes).
  *  4. NO CROSS-BASE MERGE — the scale corpus is built by key-shifted
  *     replication (`tools/gen_scale_corpus.py`: copy i of base doc b is
  *     doc_id = b + i·U), and near-dup pairs only form between copies of
  *     the same base text, so every cluster must stay inside one
  *     `doc_id % U` class (no over-merge across truly disconnected
  *     groups). U defaults to 5000 (sf0.1's doc count); pass it as the
  *     second arg for other corpora.
  *
  * (1)+(4) bound the labeling from both sides on this corpus: (1) kills
  * under-merge, (4) kills over-merge; (2)/(3) pin the label convention.
  * Path equivalence star-vs-driver is GraphSpec's job; tri-SF + 10×
  * oracle rows prove the same code against DuckDB where it fits.
  *
  * Usage: `runMain graft.tools.CcCheck [corpusDir] [baseU]`. Prints one
  * JSON line; non-zero violations abort with an assertion error.
  */
object CcCheck {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft-sf10")
    val baseU = if (args.length > 1) args(1).toLong else 5000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val t0 = System.nanoTime()
    val pairs = Dedup.minhashPairs(spark, d, 0.5)
      .select($"doc_a", $"doc_b")
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val nPairs = pairs.count()
    val lbl = Dedup.connectedComponents(pairs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nLabeled = lbl.count()
    val tCc = (System.nanoTime() - t0) / 1e9

    // 1. edge consistency
    val la = lbl.select($"doc_id".as("doc_a"), $"cluster_id".as("ca"))
    val lb = lbl.select($"doc_id".as("doc_b"), $"cluster_id".as("cb"))
    val viol1 = pairs.join(la, "doc_a").join(lb, "doc_b")
      .filter($"ca" =!= $"cb").count()
    // 2. label = member minimum
    val viol2 = lbl.groupBy($"cluster_id").agg(min($"doc_id").as("mn"))
      .filter($"mn" =!= $"cluster_id").count()
    // 3. coverage: labeled nodes == distinct pair endpoints
    val nEndpoints = pairs.select($"doc_a".as("doc_id"))
      .union(pairs.select($"doc_b".as("doc_id"))).distinct().count()
    // 4. no cross-base merge
    val viol4 = lbl.groupBy($"cluster_id")
      .agg(countDistinct(pmod($"doc_id", lit(baseU))).as("nb"))
      .filter($"nb" > 1).count()
    val nClusters = lbl.select($"cluster_id").distinct().count()
    val wall = (System.nanoTime() - t0) / 1e9

    println(s"""{"tool":"CcCheck","corpus":"$d","pairs":$nPairs,""" +
      s""""labeled_nodes":$nLabeled,"clusters":$nClusters,""" +
      s""""edge_violations":$viol1,"label_min_violations":$viol2,""" +
      s""""endpoints":$nEndpoints,"cross_base_merges":$viol4,""" +
      s""""cc_wall_sec":$tCc,"wall_sec":$wall}""")
    assert(viol1 == 0, s"$viol1 pairs straddle two clusters")
    assert(viol2 == 0, s"$viol2 clusters mislabeled (label != member min)")
    assert(nEndpoints == nLabeled,
      s"coverage mismatch: $nEndpoints endpoints vs $nLabeled labels")
    assert(viol4 == 0, s"$viol4 clusters merge across base-doc classes")
    pairs.unpersist(blocking = false)
    spark.stop()
  }
}
