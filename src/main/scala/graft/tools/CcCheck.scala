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
  *  4. NO UNSANCTIONED CROSS-BASE MERGE — the scale corpus is built by
  *     key-shifted replication (`tools/gen_scale_corpus.py`: copy i of
  *     base doc b is doc_id = b + i·U), so a cluster may span several
  *     `doc_id % U` base classes ONLY along base-level near-duplicate
  *     structure (the sf0.1 corpus plants near-dup pairs between
  *     DIFFERENT base docs — the first run of this tool assumed
  *     same-base-only and its 233 "violations" were exactly those
  *     planted base pairs). The allowed-merge graph is the base corpus's
  *     own minhash components computed at a LOWER threshold (0.4 vs the
  *     0.5 the clusters use — copy suffixes can only nudge borderline
  *     similarities, never conjure a pair below the margin), and every
  *     cluster must stay inside ONE such base component. U defaults to
  *     5000 (sf0.1's doc count).
  *
  * (1)+(4) bound the labeling from both sides on this corpus: (1) kills
  * under-merge, (4) kills over-merge beyond what the base text
  * similarity sanctions; (2)/(3) pin the label convention. Path
  * equivalence star-vs-driver is GraphSpec's job; tri-SF + 10× oracle
  * rows prove the same code against DuckDB where it fits.
  *
  * Usage: `runMain graft.tools.CcCheck [corpusDir] [baseU] [baseDir]`.
  * Prints one JSON line; non-zero violations abort.
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
    // 4. cross-base merges only along base-level near-dup components
    // (margin threshold 0.4 < the 0.5 the clusters use)
    val baseDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val baseLbl = Dedup.connectedComponents(
        Dedup.minhashPairs(spark, baseDir, 0.4).select($"doc_a", $"doc_b"))
      .select($"doc_id".as("base_id"), $"cluster_id".as("base_comp"))
    val viol4 = lbl
      .select($"cluster_id", pmod($"doc_id", lit(baseU)).as("base_id"))
      .distinct()
      .join(broadcast(baseLbl), Seq("base_id"), "left")
      .select($"cluster_id", coalesce($"base_comp", $"base_id").as("bc"))
      .groupBy($"cluster_id")
      .agg(countDistinct($"bc").as("nb"))
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
    assert(viol4 == 0,
      s"$viol4 clusters merge across UNRELATED base-doc components")
    pairs.unpersist(blocking = false)
    spark.stop()
  }
}
