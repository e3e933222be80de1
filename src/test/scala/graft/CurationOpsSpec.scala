package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Pipeline, Similarity, TextAnalysis}

/** Round-12 curation operators: two-stage rerank ([[Similarity.ragRerank]]),
  * vocabulary coverage ([[TextAnalysis.vocabCoverage]]), and the vacuum
  * planner ([[Pipeline.vacuumPlan]]). */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p: SparkPlan => p.toString
    }
  }

  test("rerank with an unbounded candidate stage equals exact brute force") {
    import spark.implicits._
    val n = Tables.embeddings(spark, sf).count().toInt
    // stage 1 keeps everything -> stage 2 IS the exact brute-force search
    val wide = Similarity.ragRerank(spark, sf, nCand = n)
      .select($"query_id", $"neighbor_id", $"sim_micro", $"rank").collect().toSeq
    // independent ground truth, computed driver-side in the same fp order
    // as Expressions.cosineSim (sequential dot/norm accumulation)
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / math.sqrt(na * nb)
    }
    val expected = (0L until 5L).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .map(id => (id, math.round(cos(vecs(q), vecs(id)) * 1000000)))
        .sortBy { case (id, m) => (-m, id) }.take(5).zipWithIndex
        .map { case ((id, m), i) => (q, id, m, i + 1L) }
    }
    assert(wide.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))) ==
      expected, "unbounded rerank diverges from exact top-k")
  }

  test("rerank output is a subset of the coarse candidate stage, ranks consistent") {
    import spark.implicits._
    val rows = Similarity.ragRerank(spark, sf).collect()
    assert(rows.length == 25, "5 queries x top-5")
    rows.foreach { r =>
      assert(r.getLong(4) >= 1L && r.getLong(4) <= 20L,
        "coarse_rank must index into the 20-candidate stage")
      assert(r.getLong(3) >= 1L && r.getLong(3) <= 5L)
    }
    // within a query, exact rank order must follow sim_micro descending
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val byRank = g.sortBy(_.getLong(3)).map(_.getLong(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        "exact rank disagrees with sim_micro order")
    }
  }

  test("vocab coverage: accounting identities and the frozen-vocab mass") {
    import spark.implicits._
    val rows = TextAnalysis.vocabCoverage(spark, sf).collect()
    rows.foreach { r =>
      val (n, inv, oov) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(inv + oov == n, s"${r.getString(0)}: in-vocab + oov != total")
      assert(r.getLong(4) == inv * 1000000L / n, "coverage_micro identity")
      assert(oov == 0 || r.getLong(5) > 0, "oov mass without oov types")
    }
    // the in-vocab mass across sources must equal the top-16 frequency sum
    val tok = Tables.documents(spark, sf)
      .select(explode(split(trim(regexp_replace(lower($"text"), "[^a-z0-9]+", " ")), " +")).as("t"))
      .filter($"t" =!= "")
    val topFreqSum = tok.groupBy($"t").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"t").limit(16).agg(sum($"c")).head().getLong(0)
    assert(rows.map(_.getLong(2)).sum == topFreqSum,
      "in-vocab occurrence mass != sum of the frozen top-16 frequencies")
    // OOV exists at every SF by construction (vocab < corpus types)
    assert(rows.map(_.getLong(3)).sum > 0, "coverage fixture has no OOV mass")
  }

  test("vocab coverage annotates the token stream with a broadcast join") {
    val plan = executed(TextAnalysis.vocabCoverage(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab join must broadcast the bounded vocabulary:\n$plan")
  }

  test("vacuum planner: statuses partition the listing, lineage arithmetic exact") {
    import spark.implicits._
    val rows = Pipeline.vacuumPlan(spark, sf).collect()
    val ids = (0 until 199).map(_.toLong)
    val deleted = ids.filter(i => i % 7 == 1 && i % 5 < 2)
    val rewritten = ids.filter(i => !(i % 7 == 1 && i % 5 < 2) && i % 3 == 0 && i % 5 < 4)
    val live = ids.filterNot(deleted.contains).filterNot(rewritten.contains)
    def tot(st: String, f: org.apache.spark.sql.Row => Long): Long =
      rows.filter(_.getString(0) == st).map(f).sum
    assert(tot("expired", _.getLong(2)) == deleted.length,
      "expired = the v2-deleted files")
    assert(tot("retained", _.getLong(2)) == rewritten.length,
      "retained = the rewritten-away originals (time travel still reads them)")
    assert(tot("live", _.getLong(2)) == live.length + rewritten.length,
      "live = current snapshot: untouched originals + replacements")
    assert(tot("expired", _.getLong(5)) == deleted.sum, "expired file_id checksum")
    assert(tot("retained", _.getLong(5)) == rewritten.sum)
    assert(tot("live", _.getLong(5)) == live.sum + rewritten.map(_ + 1000L).sum)
    // a replacement carries its original's bytes: retained mass == the
    // live created_ver=4 replacement mass (originals and copies agree)
    val replBytes = rows.filter(r => r.getString(0) == "live" && r.getLong(1) == 4L)
      .map(_.getLong(4)).sum
    val origV4Live = live.filter(_ % 5 == 4)
    // live v4 = genuinely-v4 originals + all replacements; subtract the originals
    val origV4Bytes = Tables.documents(spark, sf)
      .filter(pmod($"doc_id", lit(199)).isin(origV4Live: _*))
      .agg(coalesce(sum($"n_chars"), lit(0L))).head().getLong(0)
    assert(replBytes - origV4Bytes == tot("retained", _.getLong(4)),
      "replacement byte mass must equal the retained originals' byte mass")
  }

  test("fk audit: clean edges are zero, the corrupted edge counts its displaced keys") {
    import spark.implicits._
    val rows = Pipeline.fkAudit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
                                   r.getLong(4))).toMap
    assert(rows.size == 8)
    // every REAL edge of the generated star is referentially clean
    rows.filterNot(_._1 == "lineitem_corrupt->orders").foreach {
      case (edge, (_, orphans, nulls, dups)) =>
        assert(orphans == 0L, s"$edge has orphans")
        assert(nulls == 0L && dups == 0L, s"$edge nulls/dups")
    }
    // the simulated corruption displaces keys out of the parent domain,
    // so orphan count == displaced-row count exactly
    val displaced = Tables.lineitem(spark, sf)
      .filter(pmod($"l_orderkey", lit(997)) === 13).count()
    assert(displaced > 0, "the mod-997 lane must be non-empty at sf0.001")
    assert(rows("lineitem_corrupt->orders")._2 == displaced)
    assert(rows("lineitem_corrupt->orders")._1 ==
      Tables.lineitem(spark, sf).count())
  }

  test("incremental aggregate merge equals the full recompute (the MV theorem)") {
    import spark.implicits._
    val merged = Pipeline.incrementalAgg(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).toSeq
    val full = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
           sum(expr("CAST(round(value * 100) AS BIGINT)")).as("s"),
           max(expr("CAST(round(value * 100) AS BIGINT)")).as("mx"),
           min(expr("CAST(round(value * 100) AS BIGINT)")).as("mn"))
      .orderBy($"event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).toSeq
    assert(merged == full, s"merge(state, delta) != agg(full):\n ${merged.take(2)}\n ${full.take(2)}")
    // both slices are non-trivial — the theorem is not vacuous
    val deltaN = Tables.events(spark, sf)
      .filter(pmod($"event_id", lit(10)) === 7).count()
    assert(deltaN > 0 && deltaN < Tables.events(spark, sf).count())
  }

  test("skew planner: tiers partition the keys, salted tiers are the hot keys") {
    import spark.implicits._
    val rows = Pipeline.joinSkewPlan(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).toSeq
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_._4).sum == total, "tier row masses must partition the table")
    val target = math.max(total / 256, 1L)
    rows.foreach { case (plan, salt, nKeys, _, maxRows) =>
      assert((salt > 1) == (plan == "salt"), "plan label follows the salt factor")
      assert(nKeys > 0)
      // every key in the tier fits its salt budget (cap tier exempt)
      if (salt < 32) assert(maxRows <= salt * target,
        s"tier salt=$salt has a key with $maxRows rows > ${salt * target}")
      assert(salt >= 1 && salt <= 32)
    }
    // the simulated hot keys (user_id mod 10 collapse) must land in a
    // salted tier — the planner genuinely detects the skew it will feed
    // q41 (at sf0.001 EVERY key is hot relative to the 256-task target —
    // 15 users over 1000 rows — so a plain-hash tier only appears at
    // larger SFs; asserting its presence here would pin corpus shape,
    // not planner logic)
    assert(rows.exists(_._1 == "salt"), "hot keys must surface a salted tier")
  }
}
