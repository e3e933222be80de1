package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Lexical BM25 + hybrid RRF retrieval (the sparse half and the fusion of
  * the retrieval story; the DuckDB oracle pins the exact micro-integer
  * scores per round — here we pin semantics and scale shape). */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("BM25 ranks a planted term-stuffed document first") {
    import spark.implicits._
    val base = Tables.documents(spark, sf)
    // replicate the query-term rule for doc 0: distinct of the FIRST SIX
    // canonical tokens
    val text0 = base.filter($"doc_id" === 0).head.getAs[String]("text")
    val q0 = text0.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
      .split(" +").toSeq.take(6).distinct
    // plant: a document that is doc 0's query terms repeated 60x — max tf
    // for every query term; must out-score every organic document
    val dir = java.nio.file.Files.createTempDirectory("bm25plant").toString
    val stuffed = Seq.fill(60)(q0).flatten.mkString(" ")
    val planted = Seq((91000L, stuffed, "en", "plant", stuffed.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    base.unionByName(planted).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rank1 = Similarity.bm25Retrieve(spark, dir).collect()
      .filter(r => r.getLong(0) == 0L && r.getLong(3) == 1L)
    assert(rank1.length == 1 && rank1.head.getLong(1) == 91000L,
      s"planted doc not rank-1 for query 0: ${rank1.mkString(",")}")
  }

  test("MMR defers a redundant near-dup below a diverse lower-rel candidate") {
    import spark.implicits._
    // rel: 10 ≻ 11 ≻ 12, but 11 is a near-duplicate of 10 (sim .95);
    // pure relevance would pick 10,11,12 — MMR(λ=.7) must pick 10,12,11:
    // step 2: score(11) = 7·890000 − 3·950000 = 3 380 000
    //         score(12) = 7·500000 − 3·0      = 3 500 000 → 12 wins
    val cand = Seq((0L, 10L, 900000L), (0L, 11L, 890000L), (0L, 12L, 500000L))
      .toDF("query_id", "cand_id", "rel_micro")
    val pairs = Seq(
      (0L, 10L, 11L, 950000L), (0L, 11L, 10L, 950000L),
      (0L, 10L, 12L, 0L), (0L, 12L, 10L, 0L),
      (0L, 11L, 12L, 0L), (0L, 12L, 11L, 0L))
      .toDF("query_id", "ia", "ib", "s_micro")
    val got = Similarity.mmrSelect(cand, pairs, 3).orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 10L), (2L, 12L), (3L, 11L)),
      s"expected diversity-first order, got ${got.toSeq}")
    // a query with fewer candidates than k yields exactly its candidates
    val lone = Similarity.mmrSelect(
      Seq((1L, 20L, 100000L)).toDF("query_id", "cand_id", "rel_micro"),
      pairs.filter($"query_id" === 1L), 3).collect()
    assert(lone.length == 1 && lone.head.getLong(2) == 20L,
      s"single-candidate query must yield one pick: ${lone.mkString(",")}")
  }

  test("range search clears the threshold and agrees with brute top-1") {
    val tau = 200000L
    val rng = Similarity.knnRange(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(rng.nonEmpty, "radius search must return something at tau=0.2")
    rng.values.foreach(s => assert(s >= tau, "below-threshold row leaked"))
    // every brute rank-1 neighbor comfortably above tau must be present
    Similarity.knnBrute(spark, sf).collect()
      .filter(r => r.getLong(3) == 1L)
      .foreach { r =>
        val simMicro = math.round(r.getDouble(2) * 1000000)
        if (simMicro >= tau + 100)
          assert(rng.contains((r.getLong(0), r.getLong(1))),
            s"brute top-1 (${r.getLong(0)},${r.getLong(1)}) sim=$simMicro missing")
      }
  }

  test("hybrid RRF equals the driver-computed fusion of the two rankings") {
    def contrib(rank: Long): Long = math.round(1000000.0 / (60L + rank))
    val lex = Similarity.bm25Retrieve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> contrib(r.getLong(3)))
    val dense = Similarity.knnBrute(spark, sf, nQueries = 5, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> contrib(r.getLong(3)))
    val expected = (lex ++ dense)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .map { case ((q, doc), s) => (q, doc, s) }
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(10).zipWithIndex
          .map { case ((q, doc, s), i) => (q, doc, s, i + 1L) }
      }.sortBy(t => (t._1, t._4))
    val got = Similarity.hybridRetrieve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.length == expected.length && got.nonEmpty)
    assert(got == expected,
      s"fusion diverged: ${got.take(3)} vs ${expected.take(3)}")
  }

  test("NDCG eval equals a driver replay from the BM25 ranking and metadata") {
    import org.apache.spark.sql.functions.col
    val disc = (1 to 10)
      .map(i => i.toLong -> math.round(1000000.0 / (math.log(i + 1.0) / math.log(2.0))))
      .toMap
    val meta = Tables.documents(spark, sf).select(col("doc_id"), col("source"), col("lang"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val ranked = Similarity.bm25Retrieve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))) // (q, doc, rank)
    val got = Similarity.retrievalNdcg(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val (qs, ql) = meta(q)
      def relOf(doc: Long): Long = meta(doc) match {
        case (`qs`, `ql`) => 2L
        case (`qs`, _)    => 1L
        case _            => 0L
      }
      val rows = ranked.filter(_._1 == q)
      val dcg = rows.map { case (_, doc, rank) => relOf(doc) * disc(rank) }.sum
      assert(r.getAs[Long]("dcg_scaled") == dcg, s"q$q dcg mismatch")
      // ideal list: every 2 then every 1 over the whole corpus minus the query doc
      val n2 = meta.count { case (id, v) => id != q && v == ((qs, ql)) }.toLong
      val n1 = meta.count { case (id, (s2, l2)) => id != q && s2 == qs && l2 != ql }.toLong
      assert(r.getAs[Long]("n_rel2") == n2 && r.getAs[Long]("n_rel1") == n1)
      val idcg = (1 to 10).map { i =>
        if (i <= n2) 2L * disc(i) else if (i <= n2 + n1) disc(i) else 0L
      }.sum
      assert(r.getAs[Long]("idcg_scaled") == idcg, s"q$q idcg mismatch")
      assert(r.getAs[Long]("ndcg_micro") ==
        (if (idcg > 0) dcg * 1000000L / idcg else 0L))
      val firstRel = rows.sortBy(_._3).collectFirst {
        case (_, doc, rank) if relOf(doc) > 0 => rank }
      assert(r.getAs[Long]("mrr_micro") == firstRel.map(1000000L / _).getOrElse(0L))
      assert(r.getAs[Long]("ndcg_micro") <= 1000000L)
    }
  }

  test("set-sim join prefix filter misses NO pair vs driver brute force") {
    import spark.implicits._
    val parts = Tables.part(spark, sf)
      .select($"p_partkey", $"p_name").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").distinct.toSet)
    // brute force best ≥3/5-Jaccard neighbor per part, exact rational
    // compare (i1*u2 vs i2*u1) — the ordering the engine's one exact-int
    // double division reproduces
    val best = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    for (i <- parts.indices; j <- (i + 1) until parts.length) {
      val (ka, wa) = parts(i); val (kb, wb) = parts(j)
      val inter = (wa & wb).size.toLong
      val uni = wa.size + wb.size - inter
      if (inter * 5 >= uni * 3) {
        def consider(p: Long, q: Long): Unit = {
          val better = best.get(p) match {
            case None => true
            case Some((q0, i0, u0)) =>
              val c = (inter * u0) compare (i0 * uni) // i/u vs i0/u0
              c > 0 || (c == 0 && q < q0)
          }
          if (better) best(p) = (q, inter, uni)
        }
        consider(ka, kb); consider(kb, ka)
      }
    }
    val got = graft.operators.Similarity.setSimJoin(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == best.keySet,
      s"prefix filter missed parts: ${(best.keySet -- got.keySet).take(5)}; extra: ${(got.keySet -- best.keySet).take(5)}")
    got.foreach { case (p, v) =>
      assert(v == best(p), s"part $p best-match diverged: got $v expected ${best(p)}")
    }
    assert(got.nonEmpty)
  }

  test("fuzzy join matches blocked driver brute force") {
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    val parts = Tables.part(spark, sf)
      .select($"p_partkey", $"p_brand", $"p_name").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // UNBLOCKED brute force: best = min (dist, partner key) over ALL
    // other same-brand parts at dist ≤ 4 — the round-11 total-recall
    // contract (the length-band blocking must lose nothing); identical
    // twins included (dist 0), which is exactly the class-collapse answer
    val best = parts.map { case (k, br, name) =>
      val cands = parts.iterator.filter { case (q, qbr, _) => q != k && qbr == br }
        .map { case (q, _, qn) => (lev(name, qn).toLong, q) }
        .filter(_._1 <= 4L)
      k -> (if (cands.isEmpty) None else Some(cands.min))
    }.collect { case (k, Some((d, q))) => k -> (q, d) }.toMap
    val got = graft.operators.Similarity.fuzzyJoin(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == best.keySet,
      s"fuzzy join missed parts: ${(best.keySet -- got.keySet).take(5)}; extra: ${(got.keySet -- best.keySet).take(5)}")
    got.foreach { case (p, v) =>
      assert(v == best(p), s"part $p best fuzzy match diverged: got $v expected ${best(p)}")
    }
    assert(got.nonEmpty)
  }

  test("fuzzy join length-band blocking catches every historical escape mode") {
    import spark.implicits._
    // parts 1/2: first-token edit (the round-9 single-pass escape);
    // parts 3/4: last-token edit (the mirror mode); parts 5/6: edits on
    // BOTH anchor tokens at once — the round-10 two-pass OR-blocking's
    // documented residual escape, closed by the round-11 complete
    // length-band blocking (dist 2: prepend on tok0 + append on tokl);
    // parts 7/8: different brand at dist 1 must NOT match (blocking is
    // within-brand by contract). Part 9 has no within-dist partner and
    // must drop out.
    val df = Seq(
      (1L, "B1", "alpha beta gamma"),
      (2L, "B1", "xalpha beta gamma"),
      (3L, "B1", "zeta eta theta"),
      (4L, "B1", "zeta eta xtheta"),
      (5L, "B1", "kappa mu sigma"),
      (6L, "B1", "xkappa mu sigmax"),
      (7L, "B2", "omega psi chi"),
      (8L, "B3", "omega psi chix"),
      (9L, "B2", "totally unrelated name")
    ).toDF("p_partkey", "p_brand", "p_name")
    val got = graft.operators.Similarity.fuzzyJoinOn(df, 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((2L, 1L)) && got(2L) == ((1L, 1L)),
      s"first-token edit pair escaped the blocking: $got")
    assert(got(3L) == ((4L, 1L)) && got(4L) == ((3L, 1L)), s"$got")
    assert(got(5L) == ((6L, 2L)) && got(6L) == ((5L, 2L)),
      s"spanning edit (both anchors) escaped the length-band blocking: $got")
    assert(!got.contains(7L) && !got.contains(8L),
      s"cross-brand pair must not match: $got")
    assert(!got.contains(9L), s"partnerless part must drop out: $got")
  }

  test("BM25 scale shape: broadcast term filter, per-query rank partitions") {
    val (df, free) = Similarity.bm25RetrieveLazy(spark, sf, 5, 6, 10)
    val plan = df.queryExecution.executedPlan.toString
    free()
    assert(plan.contains("BroadcastHashJoin"),
      s"corpus token filter lost its broadcast:\n$plan")
    assert(plan.contains("hashpartitioning(query_id"),
      s"rank window not partitioned per query:\n$plan")
  }

  test("phrase search: position-verified matches agree with a driver window scan") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val rows = Similarity.phraseSearch(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val toks = Tables.documents(spark, sf)
      .select($"doc_id", TextAnalysis.wsTokens(TextAnalysis.canonical($"text")).as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val probes = toks.collect {
      case (id, w) if id % 50 == 1 && w.length >= 4 => id -> w.take(4)
    }
    assert(probes.nonEmpty && rows.keySet == probes.keySet,
      s"phrase universe mismatch: got ${rows.keySet}, want ${probes.keySet}")
    probes.foreach { case (pid, ph) =>
      val sites = toks.view.mapValues(w =>
        if (w.length < 4) 0 else w.sliding(4).count(_ == ph)).toMap
      val docs = sites.collect { case (id, n) if n > 0 => id }.toSet
      val (nSites, nDocs, idSum) = rows(pid)
      assert(nSites == sites.values.sum.toLong, s"phrase $pid: site count")
      assert(nDocs == docs.size.toLong, s"phrase $pid: doc count")
      assert(idSum == docs.sum, s"phrase $pid: id checksum")
    }
  }

  test("phrase search scale shape: probes broadcast before the index shuffles") {
    val plan = Similarity.phraseSearch(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"probe join lost its broadcast — the corpus index would shuffle on token:\n$plan")
  }
}
