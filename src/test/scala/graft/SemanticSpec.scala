package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Semantic, Similarity}

/** Semantic curation (SemDeDup + per-cluster prototypes): the keep/drop
  * rule matches a brute-force recomputation, cluster structure is
  * respected, and nothing stays pinned in the cache manager. */
class SemanticSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("semanticDedup drop rule matches brute-force within-cluster recompute") {
    import spark.implicits._
    val out = Semantic.semanticDedup(spark, sf).collect()
    assert(out.length == 500)
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
      .as[(Long, Array[Double])].collect().toMap
    val cluster = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (id, listId, keep) = (r.getLong(0), r.getLong(1), r.getBoolean(2))
      val hasCloseLower = cluster.exists { case (other, l) =>
        l == listId && other < id &&
          BigDecimal(cosine(vecs(other), vecs(id)))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP) >= BigDecimal(Semantic.DefaultTau)
      }
      assert(keep == !hasCloseLower, s"vec $id keep=$keep but close-lower=$hasCloseLower")
    }
    // non-degenerate at this SF: some drops, most kept
    val dropped = out.count(!_.getBoolean(2))
    assert(dropped > 0 && dropped < 100, s"dropped=$dropped")
  }

  test("lowest-id member of every cluster is always kept") {
    val out = Semantic.semanticDedup(spark, sf).collect()
    out.groupBy(_.getLong(1)).foreach { case (listId, members) =>
      val first = members.minBy(_.getLong(0))
      assert(first.getBoolean(2), s"cluster $listId lowest id ${first.getLong(0)} dropped")
    }
  }

  test("prototypes: dense ranks per cluster, descending similarity, consistent assignment") {
    import spark.implicits._
    val out = Semantic.prototypes(spark, sf).collect()
    val byList = out.groupBy(_.getLong(0))
    assert(byList.size == Semantic.DefaultLists)
    byList.foreach { case (listId, rows) =>
      val ranks = rows.map(_.getLong(2)).sorted
      assert(ranks.sameElements(1L to rows.length), s"cluster $listId ranks $ranks")
      val sims = rows.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"cluster $listId sims not descending: ${sims.toSeq}")
    }
    // every prototype really is assigned to the cluster it's ranked in
    val assign = {
      val vecs = Tables.embeddings(spark, sf)
        .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
      val cent = Similarity.lloydCentroids(vecs, Semantic.DefaultLists,
        Similarity.DefaultLloydIters)
      Similarity.coarseAssign(vecs, cent)
        .select($"vec_id", $"list_id").as[(Long, Long)].collect().toMap
    }
    out.foreach(r => assert(assign(r.getLong(1)) == r.getLong(0)))
  }

  test("cluster quality: every trained list separates from its neighbors") {
    val rows = Semantic.clusterQuality(spark, sf).collect()
    assert(rows.length == Semantic.DefaultLists)
    assert(rows.map(_.getLong(1)).sum == 500L, "quality rows must cover the corpus")
    rows.foreach { r =>
      assert(r.getDouble(4) > 0.0,
        s"cluster ${r.getLong(0)}: members closer to a foreign centroid (${r.getDouble(4)})")
      assert(r.getDouble(2) > r.getDouble(3))
    }
  }

  test("semantic queries leave no pinned storage behind") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Semantic.semanticDedup(spark, sf).collect()
    Semantic.prototypes(spark, sf).collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }
}
