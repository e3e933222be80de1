package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Expressions
import graft.operators._

/** Unit + behavioral tests for the LLM-data-pipeline operators. */
class ExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("simhash: identical token arrays give identical sketches") {
    val df = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "c", "d")),
      (3L, Seq("x", "y", "z", "w"))).toDF("id", "toks")
      .select($"id", Expressions.simhash60($"toks").as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    assert(m(1L) != m(3L))
  }

  test("simhash: near-identical docs land within small hamming distance") {
    val base = (1 to 60).map(i => s"tok$i")
    val similar = base.updated(5, "CHANGED").updated(40, "ALSO")
    val other = (1 to 60).map(i => s"other$i")
    val df = Seq((1L, base), (2L, similar), (3L, other)).toDF("id", "toks")
      .select($"id", Expressions.simhash60($"toks").as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(2L)) <= 12, s"near-dup hamming ${ham(m(1L), m(2L))}")
    assert(ham(m(1L), m(3L)) >= 16, s"unrelated hamming ${ham(m(1L), m(3L))}")
  }

  test("cosine_sim matches hand computation, handles zero norm") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0), Some(1.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0), Some(0.0)),
      (Seq(1.0, 2.0), Seq(2.0, 4.0), Some(1.0)),
      (Seq(0.0, 0.0), Seq(1.0, 1.0), None))
      .toDF("a", "b", "want")
      .select(Expressions.cosineSim($"a", $"b").as("got"), $"want")
    df.collect().foreach { r =>
      val want = if (r.isNullAt(1)) null else r.getDouble(1)
      if (want == null) assert(r.isNullAt(0))
      else assert(math.abs(r.getDouble(0) - want.asInstanceOf[Double]) < 1e-12)
    }
  }

  test("expressions registered for SQL use") {
    Expressions.register(spark)
    val r = spark.sql(
      "SELECT hamming64(simhash60(array('a','b')), simhash60(array('a','b'))) h, " +
      "cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) c, " +
      "dup_gram_fraction(array('a','b','a','b','x'), 2) d").head()
    assert(r.getInt(0) == 0 && math.abs(r.getDouble(1) - 1.0) < 1e-12)
    // grams: ab, ba, ab, bx -> one duplicate of four
    assert(math.abs(r.getDouble(2) - 0.25) < 1e-12)
    // the KMV aggregate from SQL: below k the estimate is exact
    val kmv = spark.sql(
      """SELECT kmv_distinct(CAST(conv(substring(md5(concat_ws('|', 'kmv', id)), 1, 15), 16, 10) AS BIGINT))
         FROM range(0, 100)""").head().getDouble(0)
    assert(kmv == 100.0, s"SQL kmv_distinct of 100 ids gave $kmv")
  }
}

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("keep-best representative: highest quality score wins its cluster") {
    import graft.operators.Eval
    val clusters = Dedup.nearDupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val score = Eval.scoredDocs(spark, sf).collect()
      .map(r => r.getLong(3) -> r.getLong(2)).toMap
    val chars = Tables.documents(spark, sf).select($"doc_id", $"n_chars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = clusters.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (cid, members) =>
        val ids = members.map(_._1)
        val keep = ids.maxBy(id => (score(id), -id))
        (cid, ids.length.toLong, keep, score(keep), ids.length.toLong - 1,
         ids.map(chars).sum - chars(keep))
    }
    val got = Dedup.keepBestInCluster(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected,
      s"keep-best mismatch:\n got=${got.take(3)}\n exp=${expected.take(3)}")
    got.foreach { case (cid, n, keep, _, dropped, _) =>
      assert(n >= 2 && dropped == n - 1, s"cluster $cid inconsistent")
      assert(clusters.exists(m => m._1 == keep && m._2 == cid),
        s"cluster $cid keeps non-member $keep")
    }
  }

  test("minhash LSH finds planted near-duplicates with high estimated jaccard") {
    // plant: doc 2000 = doc 8's text with one word changed
    val base = Tables.documents(spark, sf)
    val planted = base.limit(1).select(
      lit(99999L).as("doc_id"),
      concat($"text", lit(" tailword")).as("text"),
      $"lang", $"source", $"n_chars")
    val docs = base.unionByName(planted)
    docs.createOrReplaceTempView("planted_docs")
    // run the same pipeline over the in-memory union
    val sh = docs.select($"doc_id", Dedup.minhashSignature($"text").as("sig"))
    val banded = sh.select($"doc_id", $"sig",
      posexplode(Dedup.bandKeys($"sig")).as(Seq("band", "key")))
    val a = banded.as("a"); val b = banded.as("b")
    val pairs = a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates().collect().map(r => (r.getLong(0), r.getLong(1)))
    val first = base.orderBy($"doc_id").first().getAs[Long]("doc_id")
    assert(pairs.contains((first, 99999L)), s"planted pair missing from ${pairs.take(20).toSeq}")
  }

  test("containment finds a subset doc the Jaccard detector misses, with the right direction") {
    // doc 1 = 200 words; doc 2 = its first 30 words verbatim (every
    // shingle of doc 2 is a shingle of doc 1 → containment of 2-in-1 is
    // 1.0) plus nothing else; doc 3 shares nothing. True Jaccard of
    // (1,2) ≈ 26/196 ≈ 0.13 — far below the 0.3 ngram threshold.
    val big = (1 to 200).map(i => s"w$i").mkString(" ")
    val small = (1 to 30).map(i => s"w$i").mkString(" ")
    val other = (1 to 40).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, big), (2L, small), (3L, other)).toDF("doc_id", "text")
    val got = Dedup.containmentPairsOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("cont_a_micro"),
                 r.getAs[Long]("cont_b_micro")))
    assert(got.length == 1, s"expected exactly the planted pair, got ${got.toSeq}")
    val (a, b, ca, cb) = got.head
    assert((a, b) == (1L, 2L))
    assert(cb == 1000000L, s"small-in-big containment should be exactly 1.0, got $cb")
    assert(ca < 200000L, s"big-in-small containment should be small, got $ca")
    // and the Jaccard the symmetric family thresholds on is indeed far
    // below 0.3 for this pair (the asymmetry gap containment closes)
    val j = docs.filter($"doc_id" <= 2)
      .select(Dedup.shingleHashes($"text").as("sh"))
      .agg(collect_list($"sh")).head.getSeq[Seq[Long]](0)
    val jacc = spark.range(1)
      .select(Expressions.jaccardSorted(typedLit(j(0)), typedLit(j(1))))
      .head.getDouble(0)
    assert(jacc < 0.3, s"plant too similar: jaccard $jacc")
  }

  test("substring dedup finds a planted repeated span with exact extent") {
    // a 20-token span shared between docs 1 and 2 at different offsets;
    // doc 3 shares nothing 8 tokens long
    val shared = (1 to 20).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha one two three $shared tail one"),
      (2L, s"$shared completely different ending here"),
      (3L, "nothing in common with the others at all twelve tokens maybe"))
      .toDF("doc_id", "text")
    val spans = Dedup.substringSpansOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // maximal extents exactly recover the plant: doc 1 carries it at token
    // positions 5..24, doc 2 at 1..20 — span_len = 20 in both
    assert(spans.toSet == Set((1L, 5L, 20L), (2L, 1L, 20L)),
      s"got ${spans.toSeq}")
    // below the k-gram floor nothing is reported: a 7-token shared run
    val short = Seq(
      (1L, "x1 x2 x3 x4 x5 x6 x7 aa bb cc dd ee ff gg hh"),
      (2L, "x1 x2 x3 x4 x5 x6 x7 zz yy ww vv uu tt ss rr"))
      .toDF("doc_id", "text")
    assert(Dedup.substringSpansOf(short).collect().isEmpty)
  }

  test("exact dedup keeps one copy per canonical text") {
    val out = Dedup.exact(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_copies")).sum == Tables.documents(spark, sf).count())
    assert(out.forall(_.getAs[Long]("n_copies") >= 1))
  }

  test("decontamination flags train docs overlapping the eval slice") {
    val out = Dedup.decontaminate(spark, sf).collect()
    assert(out.nonEmpty, "expected planted near-dups to cross the eval slice")
    out.foreach { r =>
      val (train, eval) = (r.getAs[Long]("train_id"), r.getAs[Long]("eval_id"))
      assert(eval % 10 == 0 && train % 10 != 0, s"sides swapped: $train / $eval")
      assert(r.getAs[Long]("n_shared") >= 3)
      val frac = r.getAs[Double]("overlap_frac")
      assert(frac > 0.0 && frac <= 1.0, s"overlap_frac out of range: $frac")
    }
    // ground truth on the worst offender: its shingle sets really intersect
    val top = out.maxBy(_.getAs[Long]("n_shared"))
    val sh = Tables.documents(spark, sf)
      .filter($"doc_id".isin(top.getAs[Long]("train_id"), top.getAs[Long]("eval_id")))
      .select(Dedup.shingleHashes($"text")).collect().map(_.getSeq[Long](0).toSet)
    assert(sh(0).intersect(sh(1)).size == top.getAs[Long]("n_shared"))
  }

  test("cross-source overlap matrix equals a driver-side shingle-set replay") {
    val perSource = Tables.documents(spark, sf)
      .select($"source", Dedup.shingleHashes($"text")).collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).toSet))
      .groupBy(_._1).view.mapValues(_.map(_._2).reduce(_ ++ _)).toMap
    val sources = perSource.keys.toSeq.sorted
    val expected = (for {
      a <- sources; b <- sources if a < b
      shared = perSource(a).intersect(perSource(b)).size.toLong if shared > 0
    } yield {
      val (na, nb) = (perSource(a).size.toLong, perSource(b).size.toLong)
      (a, b, shared, na, nb, shared * 1000000L / (na + nb - shared))
    }).sortBy(t => (t._1, t._2))
    val got = Dedup.sourceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
                 r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected, s"overlap mismatch: got=${got.take(3)} exp=${expected.take(3)}")
    assert(expected.nonEmpty, "fixture sources must share shingles")
  }

  test("KMV overlap sketch equals a driver-side k-smallest replay and tracks exact Jaccard") {
    val k = 256
    val perSource = Tables.documents(spark, sf)
      .select($"source", Dedup.shingleHashes($"text")).collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).toSet))
      .groupBy(_._1).view.mapValues(_.map(_._2).reduce(_ ++ _)).toMap
    val sk = perSource.view.mapValues(_.toSeq.sorted.take(k)).toMap
    val sources = sk.keys.toSeq.sorted
    val expected = (for { a <- sources; b <- sources if a < b } yield {
      val mg = (sk(a) ++ sk(b)).distinct.sorted.take(k)
      val both = mg.count(h => sk(a).contains(h) && sk(b).contains(h)).toLong
      val kUsed = mg.size.toLong
      val estUnion =
        if (kUsed < k) kUsed.toDouble
        else {
          val raw = (k - 1).toDouble * 1152921504606846976L.toDouble / mg(k - 1).toDouble
          BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      (a, b, kUsed, both, both * 1000000L / kUsed, estUnion)
    }).sortBy(t => (t._1, t._2))
    val got = Dedup.sourceOverlapKmv(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expected, s"kmv mismatch: got=${got.take(2)} exp=${expected.take(2)}")
    // estimator quality: the sketch Jaccard tracks the exact matrix
    // within the k=256 sampling envelope (σ ≈ √(J/k) ≈ 0.01 here)
    val exact = Dedup.sourceOverlap(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(5))).toMap
    got.foreach { case (a, b, _, _, estMicro, _) =>
      val ex = exact.getOrElse((a, b), 0L)
      assert(math.abs(estMicro - ex) <= 60000L,
        s"($a,$b): kmv est $estMicro vs exact $ex off by more than 0.06")
    }
  }

  test("novelty curve equals a first-seen replay; first doc fully novel, mass conserved") {
    val perDoc = Tables.documents(spark, sf)
      .select($"doc_id", Dedup.shingleHashes($"text")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    val firstSeen = scala.collection.mutable.HashMap.empty[Long, Long]
    perDoc.foreach { case (id, hs) =>
      hs.foreach(h => if (!firstSeen.contains(h)) firstSeen(h) = id)
    }
    val expected = perDoc.map { case (id, hs) =>
      val novel = hs.count(h => firstSeen(h) == id).toLong
      (id, hs.length.toLong, novel, novel * 1000000L / hs.length)
    }.toSeq
    val got = Dedup.noveltyCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, s"novelty mismatch: got=${got.take(3)} exp=${expected.take(3)}")
    assert(got.head._4 == 1000000L, "lowest-id doc must be fully novel")
    // conservation: total novel shingles = distinct shingles in the corpus
    assert(got.map(_._3).sum == firstSeen.size.toLong)
  }

  test("bloom decontamination pre-pass: superset of exact, bounded FPs") {
    val exact = Dedup.decontaminate(spark, sf).collect()
    val bloom = Dedup.decontaminateBloom(spark, sf).collect()
      .map(r => r.getAs[Long]("train_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Boolean]("candidate"))).toMap
    val nTrain = Tables.documents(spark, sf).filter($"doc_id" % 10 =!= 0).count()
    assert(bloom.size == nTrain, "every train doc must be scored")
    // no false negatives: every truly contaminated train doc is a
    // candidate, and its bloom hit count covers the exact shared count
    exact.foreach { r =>
      val (train, shared) = (r.getAs[Long]("train_id"), r.getAs[Long]("n_shared"))
      val (hits, cand) = bloom(train)
      assert(cand, s"contaminated train doc $train not a bloom candidate")
      assert(hits >= shared, s"doc $train: $hits bloom hits < $shared exact shares")
    }
    // false positives stay a small fraction of the train side (the mask
    // is sized so the all-k-bits test rarely fires spuriously)
    val truly = exact.map(_.getAs[Long]("train_id")).toSet
    val falsePos = bloom.count { case (id, (_, c)) => c && !truly(id) }
    assert(falsePos <= math.max(2L, nTrain / 10),
      s"$falsePos bloom false positives out of $nTrain train docs")
  }

  test("simhash pairs agree with minhash pairs on strong duplicates") {
    val mh = Dedup.minhashPairs(spark, sf, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = Dedup.simhashPairs(spark, sf, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // strong minhash dups should overwhelmingly be simhash dups too
    if (mh.nonEmpty) {
      val overlap = mh.intersect(sh).size.toDouble / mh.size
      assert(overlap >= 0.5, s"simhash found ${sh.size}, minhash ${mh.size}, overlap $overlap")
    }
  }
}

/** Near-dup clustering is transitive even though similarity is not. */
class ClusterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  test("min-label propagation finds connected components of a chain + islands") {
    import spark.implicits._
    // chain 1-2-3-4, pair 10-11, singleton edges 20-21; 3 components
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (21L, 20L))
      .toDF("doc_a", "doc_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
                       10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L)
    // driver union-find path (default threshold)
    val viaDriver = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == expected)
    // distributed min-label path (threshold forced to 0)
    val viaCluster = Dedup.connectedComponents(pairs, driverThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaCluster == expected)
  }

  test("clustering leaves no pinned storage behind (both paths)") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    Dedup.connectedComponents(pairs).collect()
    Dedup.connectedComponents(pairs, driverThreshold = 0L).collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }
}

/** Round-2 review follow-up: within-query caches (LSH sketch base,
  * exploded trigram frame, ntile range partitioning) must be released once
  * the query's result materializes — a long-lived session running these
  * repeatedly must not accumulate storage ([[graft.plans.Caching.detach]]). */
class CacheHygieneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("sketch-base, trigram, and ntile caches are freed after the result") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    assert(Dedup.ngramJaccardPairs(spark, sf).collect().nonEmpty)
    assert(TextAnalysis.trigramLmScore(spark, sf).collect().nonEmpty)
    assert(Relational.q35NtileScalable(spark, sf).collect().nonEmpty)
    assert(Pipeline.stratifiedByQuality(spark, sf).collect().nonEmpty)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }

  test("round-4 persisted bases (decontaminate, BPE vocab) are freed too") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    assert(Dedup.decontaminate(spark, sf).collect().nonEmpty)
    assert(TextAnalysis.bpeLearn(spark, sf, nMerges = 2).collect().length == 2)
    assert(TextAnalysis.bpeApply(spark, sf, nMerges = 2).collect().nonEmpty)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }
}

/** Incremental-ingest dedup invariant: splitting the corpus and deduping
  * the second half against the first half's digests reproduces the batch
  * result exactly. */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("exactIncremental(new, digests(old)) completes exact(all)") {
    import spark.implicits._
    val all = graft.Tables.documents(spark, sf)
    val cut = 250L
    val old = all.filter($"doc_id" < cut)
    val fresh = all.filter($"doc_id" >= cut)
    val fullKeepers = Dedup.exact(spark, sf)
      .select($"keeper_id").collect().map(_.getLong(0)).toSet
    val oldKeepers = old
      .select($"doc_id", org.apache.spark.sql.functions.md5(
        graft.operators.TextAnalysis.canonical($"text")).as("k"))
      .groupBy($"k").agg(org.apache.spark.sql.functions.min($"doc_id").as("doc_id"))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val incremental = Dedup.exactIncremental(fresh, Dedup.digests(old))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert((oldKeepers ++ incremental) == fullKeepers,
      s"old=${oldKeepers.size} inc=${incremental.size} full=${fullKeepers.size}")
    assert(incremental.forall(_ >= cut))
  }

  test("minhashIncremental verdicts agree with the full-corpus pair list") {
    import spark.implicits._
    val cut = 250L
    val verdicts = Dedup.minhashIncrementalQuery(spark, sf, cut).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(verdicts.nonEmpty && verdicts.keySet.forall(_ >= cut))
    // ground truth from the one-shot pair query over the whole corpus:
    // a cross-split pair flags dup_corpus, a batch-side pair dup_batch
    val pairs = Dedup.minhashPairs(spark, sf, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expCorpus = pairs.collect { case (a, b) if a < cut && b >= cut => b }.toSet
    val expBatch = pairs.collect { case (a, b) if a >= cut => b }.toSet
    verdicts.foreach { case (id, (dc, db, keep)) =>
      assert(dc == expCorpus.contains(id), s"doc $id dup_corpus")
      assert(db == expBatch.contains(id), s"doc $id dup_batch")
      assert(keep == (!dc && !db))
    }
    // the batch contains both planted near-dups and clean docs
    assert(verdicts.values.exists(v => v._1 || v._2) && verdicts.values.exists(_._3))
    // sketch-state handoff leaves nothing pinned
    val leaked = spark.sparkContext.getPersistentRDDs.keySet
    Dedup.minhashIncrementalQuery(spark, sf, cut).collect()
    assert((spark.sparkContext.getPersistentRDDs.keySet -- leaked).isEmpty)
  }
}

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("coarse assignment is one projection: no join, no exchange, no aggregate") {
    import spark.implicits._
    import org.apache.spark.sql.functions.transform
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    val cent = Similarity.lloydCentroids(vecs, nLists = 16, iterations = 1)
    val plan = Similarity.coarseAssign(vecs, cent)
      .queryExecution.executedPlan.toString
    // the literal-centroid argmax (round-8): assignment must stay a
    // map-side projection — any Join/Exchange/Aggregate here re-introduces
    // the 256M-row build shape AnnScale measured at 839s vs 42s
    assert(!plan.contains("Join"), s"assignment plans a join:\n$plan")
    assert(!plan.contains("Exchange"), s"assignment shuffles:\n$plan")
    assert(!plan.contains("Aggregate"), s"assignment re-aggregates:\n$plan")
    // and it agrees with the join-formulated lazy chain's final assignment
    // (bit-identical argmax ordering)
    val viaLit = Similarity.coarseAssign(vecs, cent)
      .select($"vec_id", $"list_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaJoinCent = Similarity.lloydCentroidsLazy(vecs, 16, 1)
    val localCent = spark.createDataFrame(
      java.util.Arrays.asList(viaJoinCent.collect(): _*), viaJoinCent.schema)
    val sameCentroids = localCent.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val eagerCentroids = cent.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(sameCentroids == eagerCentroids,
      "eager Lloyd centroids differ from the lazy join-formulated chain")
    assert(viaLit.size == vecs.count())
  }

  test("embedding-quality audit equals a driver-side micro-quantized replay") {
    def micro(x: Float): Long =
      BigDecimal(x.toDouble * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => (r.getInt(2), r.getSeq[Float](1)))
    val expected = vecs.groupBy(_._1).toSeq.map { case (label, vs) =>
      val n2s = vs.map { case (_, e) => e.map(x => { val m = micro(x); m * m }).sum }
      val dims = vs.map(_._2.length.toLong)
      (label, vs.length.toLong, dims.distinct.length.toLong, dims.min,
       n2s.count(_ == 0L).toLong, n2s.min, n2s.max,
       (n2s.map(BigInt(_)).sum / vs.length).toLong)
    }.sortBy(_._1)
    val got = Similarity.embedQuality(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == expected, s"embed audit mismatch:\n got=${got.take(2)}\n exp=${expected.take(2)}")
    // a healthy corpus: uniform dimensionality, no zero vectors
    assert(got.forall(r => r._3 == 1L && r._5 == 0L))
  }

  test("LSH ANN achieves reasonable recall@5 vs brute force") {
    val brute = Similarity.knnBrute(spark, sf, nQueries = 5, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.knnLsh(spark, sf, nQueries = 5, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    // the sf corpus is iid-random vectors, so even true top-5 neighbors sit
    // at noise level (cos≈0.4) — LSH recall is bounded by physics here; the
    // planted-neighbor test below covers the actual near-dup use case
    assert(recall >= 0.2, s"recall@5 = $recall")
  }

  test("LSH ANN finds planted true near-neighbors at rank 1") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // plant: vector 90000+q = query q scaled by 0.9 (cosine 1.0)
    val base = Tables.embeddings(spark, sf)
    val planted = base.filter($"vec_id" < 5).select(
      ($"vec_id" + 90000L).as("vec_id"),
      transform($"embedding", x => x * 0.9f).as("embedding"),
      $"label")
    val dir = java.nio.file.Files.createTempDirectory("emb").toString
    base.unionByName(planted).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val lsh = Similarity.knnLsh(spark, dir, nQueries = 5, k = 5).collect()
    val rank1 = lsh.filter(_.getLong(3) == 1L)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 5).foreach { q =>
      assert(rank1.get(q.toLong).contains(90000L + q),
        s"query $q: rank-1 neighbor ${rank1.get(q.toLong)} != ${90000 + q}")
    }
  }

  test("IVF ANN finds planted true near-neighbors at rank 1") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Tables.embeddings(spark, sf)
    val planted = base.filter($"vec_id" < 5).select(
      ($"vec_id" + 90000L).as("vec_id"),
      transform($"embedding", x => x * 0.9f).as("embedding"),
      $"label")
    val dir = java.nio.file.Files.createTempDirectory("embivf").toString
    base.unionByName(planted).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val ivf = Similarity.knnIvf(spark, dir, nQueries = 5, k = 5).collect()
    val rank1 = ivf.filter(_.getLong(3) == 1L)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 5).foreach { q =>
      assert(rank1.get(q.toLong).contains(90000L + q),
        s"query $q: rank-1 neighbor ${rank1.get(q.toLong)} != ${90000 + q}")
    }
  }

  test("lloyd centroid build aggregates whole vectors — no posexplode fan-out") {
    import spark.implicits._
    import org.apache.spark.sql.functions.transform
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    val chain = Similarity.lloydCentroidsLazy(vecs, nLists = 16, iterations = 2)
    val plan = chain.queryExecution.executedPlan.toString
    // the centroid average must consume one row per vector via the typed
    // vector-sum aggregate, not explode dims× rows and re-group
    assert(!plan.contains("posexplode"), s"explode fan-out in centroid build:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"typed aggregate missing:\n$plan")
    // and converge to sane centroids: 64 dims, n <= nLists (via the
    // materialized entry point the index build actually uses)
    val rows = Similarity.lloydCentroids(vecs, nLists = 16, iterations = 2).collect()
    assert(rows.nonEmpty && rows.length <= 16)
    assert(rows.forall(_.getSeq[Double](1).length == 64))
  }

  test("more Lloyd iterations do not hurt planted-neighbor recall") {
    import spark.implicits._
    val r1 = Similarity.knnIvf(spark, sf, nQueries = 5, k = 5, lloydIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    val r3 = Similarity.knnIvf(spark, sf, nQueries = 5, k = 5, lloydIters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    // both depths produce full result sets; deeper refinement keeps the
    // top-1 hits of the shallow quantizer (recall is monotone-ish on this
    // corpus — the strong neighbors sit well inside their lists)
    assert(r1.size == 25 && r3.size == 25)
    val top1Agree = (0 until 5).count(q => r1.get((q.toLong, 1L)) == r3.get((q.toLong, 1L)))
    assert(top1Agree >= 4, s"top-1 flipped for ${5 - top1Agree} queries")
  }

  test("LSH recall@5 against the exact baseline is useful and deterministic") {
    // sf0.01: at the micro corpus (sf0.001) buckets are too sparse for a
    // meaningful recall floor
    val rows = Similarity.knnRecall(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 5)
    val recalls = rows.map(_.getDouble(2))
    assert(recalls.forall(_ > 0.0), s"a query found nothing: ${recalls.mkString(",")}")
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.6, s"mean recall@5 $mean below the multi-probe design point")
  }

  test("product quantization keeps useful recall at 32 bits per vector") {
    val sf01 = "/root/testdata/sf0.01"
    val exact = Similarity.knnBrute(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.knnPq(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pq.size == exact.size && pq.nonEmpty)
    // PQ at 4x16 codes compresses 16x harder than int8 SQ — the bar is
    // usefulness (codes separate neighbors from the bulk), not agreement
    val recall = exact.intersect(pq).size.toDouble / exact.size
    assert(recall >= 0.3, s"PQ recall@5 vs brute force fell to $recall")
    // deterministic: training, encode, and scoring have pinned tie-breaks
    val again = Similarity.knnPq(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == pq)
  }

  test("IVF+PQ with exact re-rank recovers most of the uncompressed IVF answer") {
    val sf01 = "/root/testdata/sf0.01"
    val ivf = Similarity.knnIvf(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = Similarity.knnIvfPq(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivfpq.size == ivf.size && ivfpq.nonEmpty)
    // same probed lists, so the only loss is PQ's ADC shortlist missing a
    // true neighbor before the exact re-rank — the 3x shortlist should
    // keep most of them
    val agree = ivf.intersect(ivfpq).size.toDouble / ivf.size
    assert(agree >= 0.6, s"IVF+PQ agreement with IVF fell to $agree")
  }

  test("prefix-dimension (MRL) retrieval recovers most of the exact answer") {
    val sf01 = "/root/testdata/sf0.01"
    val exact = Similarity.knnBrute(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mrl = Similarity.knnMrl(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mrl.size == exact.size && mrl.nonEmpty)
    // a 32-of-64-dim shortlist at 3x depth keeps most true neighbors
    val recall = exact.intersect(mrl).size.toDouble / exact.size
    assert(recall >= 0.4, s"MRL recall@5 vs brute force fell to $recall")
  }

  test("binary quantization still separates neighbors at 1 bit per dimension") {
    val sf01 = "/root/testdata/sf0.01"
    val exact = Similarity.knnBrute(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bq = Similarity.knnBq(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bq.size == exact.size && bq.nonEmpty)
    // 512x compression: the bar is usefulness of the Hamming shortlist
    val recall = exact.intersect(bq).size.toDouble / exact.size
    assert(recall >= 0.3, s"BQ recall@5 vs brute force fell to $recall")
  }

  test("int8 scalar quantization barely perturbs the ranking") {
    val sf01 = "/root/testdata/sf0.01"
    val exact = Similarity.knnBrute(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    val sq8 = Similarity.knnSq8(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    assert(sq8.size == exact.size && sq8.nonEmpty)
    // top-1 must survive 8-bit quantization for every query; overall
    // agreement stays high (the int8 grid error is ~0.2% of the range)
    (0 until 5).foreach { q =>
      assert(sq8((q.toLong, 1L)) == exact((q.toLong, 1L)),
        s"query $q: top-1 flipped under quantization")
    }
    val agree = exact.count { case (k, v) => sq8.get(k).contains(v) }
    assert(agree >= 20, s"only $agree/25 ranks identical after quantization")
  }

  test("RAG retrieval returns the neighbor documents' actual text") {
    import spark.implicits._
    val hits = Similarity.ragRetrieve(spark, sf).collect()
    assert(hits.length == 25)
    val texts = Tables.documents(spark, sf)
      .select($"doc_id", org.apache.spark.sql.functions.substring($"text", 1, 40))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    hits.foreach { r =>
      assert(r.getString(4) == texts(r.getLong(2)),
        s"passage for neighbor ${r.getLong(2)} is not that document's text")
    }
    // neighbor sets equal the plain ANN answer — the join adds payload only
    val plain = Similarity.knnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(1))).toSet
    assert(hits.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == plain)
  }

  test("brute-force knn is exact: sims descend, no self-matches") {
    val rows = Similarity.knnBrute(spark, sf, nQueries = 3, k = 5).collect()
    assert(rows.length == 15)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val sims = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (x, y) => x >= y }, s"not sorted for $q")
      assert(rs.forall(_.getLong(1) != q))
    }
  }
}

/** Persisted IVF index: build-once layout, partition-pruned queries,
  * results identical to the inline IVF pipeline. */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("index layout, pruning, and parity with inline knnIvf") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    operators.IvfIndex.build(spark, sf, dir, nLists = 16)
    // layout: one directory per inverted list
    val listDirs = new java.io.File(s"$dir/lists").listFiles()
      .filter(_.getName.startsWith("list_id=")).map(_.getName)
    assert(listDirs.nonEmpty && listDirs.length <= 16)

    val queries = graft.Tables.embeddings(spark, sf).filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), transform($"embedding", _.cast("double")).as("qv"))
    val viaIndex = operators.IvfIndex.query(spark, dir, queries, k = 5, nProbe = 4)
    // the list scan must carry a partition filter (directory pruning)
    assert(viaIndex.queryExecution.executedPlan.toString.contains("PartitionFilters: [list_id"),
      s"no partition pruning: ${viaIndex.queryExecution.executedPlan}")
    val a = viaIndex.collect().map(_.toSeq)
    val b = operators.Similarity.knnIvf(spark, sf, nQueries = 5, k = 5).collect().map(_.toSeq)
    assert(a.length == b.length && a.nonEmpty)
    assert(a.zip(b).forall { case (x, y) => x == y },
      s"index query diverges from inline IVF")
  }

  test("append adds a batch under the frozen quantizer; queries see the union") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("ivfappend").toString
    val all = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    // cut INSIDE the corpus (sf0.01 has vec_id 0..499) so the appended
    // batch is non-empty — a cut past the max id would pass vacuously
    val cut = 250L
    val (oldB, newB) = (all.filter($"vec_id" < cut), all.filter($"vec_id" >= cut))
    assert(newB.count() > 0, "append batch must not be empty")
    // build on the old batch only, then append the new one
    val oldDir = java.nio.file.Files.createTempDirectory("ivfappend-src").toString
    graft.Tables.embeddings(spark, sf).filter($"vec_id" < cut)
      .write.parquet(s"$oldDir/embeddings.parquet")
    operators.IvfIndex.build(spark, oldDir, dir, nLists = 16)
    operators.IvfIndex.append(spark, dir, newB)
    // expected: the union assigned against the OLD batch's centroids
    val centroids = spark.read.parquet(s"$dir/centroids")
    val queries = all.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val got = operators.IvfIndex.query(spark, dir, queries, k = 5, nProbe = 4)
      .collect().map(_.toSeq)
    val probes = operators.Similarity.probeLists(queries, centroids, nProbe = 4)
    val cand = operators.Similarity.coarseAssign(all, centroids)
      .join(probes, Seq("list_id"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
              graft.functions.Expressions.cosineSim($"qv", $"v").as("sim"))
    val want = operators.Similarity.rankWithin(cand, 5).collect().map(_.toSeq)
    assert(got.length == want.length && got.nonEmpty)
    assert(got.zip(want).forall { case (x, y) => x == y },
      "appended index diverges from assign-all-under-frozen-centroids")
    // and the appended rows really landed in partition directories
    val total = spark.read.parquet(s"$dir/lists").count()
    assert(total == all.count(), s"lists hold $total of ${all.count()} vectors")
    // the oracle-paired incremental query is this exact pipeline end to
    // end: frozen old-half quantizer, union assignment, probed search
    val viaQuery = operators.Similarity.knnIvfIncremental(spark, sf, cut)
      .collect().map(_.toSeq)
    assert(viaQuery.length == got.length,
      s"knnIvfIncremental row count ${viaQuery.length} != persisted path ${got.length}")
    assert(viaQuery.sameElements(got),
      "knnIvfIncremental diverges from the persisted build+append+query path")
  }
}

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("media table has binary payload + metadata schema") {
    val df = Multimodal.mediaTable(spark, sf).toDF()
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("payload") == "binary")
    assert(types("modality") == "string" && types("width") == "int")
    assert(df.select("modality").distinct().count() == 3)
  }

  test("content dedup stats reconcile against a driver-side digest replay") {
    val rows = Multimodal.contentDedupStats(spark, sf).collect()
    assert(rows.length == 3)
    val byPayload = Multimodal.mediaTable(spark, sf).collect()
      .groupBy(m => (m.modality, m.payload.toSeq))
    rows.foreach { r =>
      val mod = r.getString(0)
      val groups = byPayload.filter(_._1._1 == mod)
      assert(r.getLong(1) == groups.values.map(_.length).sum, s"$mod n_media")
      assert(r.getLong(2) == groups.size, s"$mod n_distinct")
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2), s"$mod dup identity")
      assert(r.getLong(4) == groups.values.flatMap(_.map(_.payload.length.toLong)).sum,
        s"$mod bytes_total")
      // keys is a Set — map through a Seq or equal lengths dedup away
      assert(r.getLong(5) == groups.keys.toSeq.map(_._2.length.toLong).sum,
        s"$mod bytes_dedup")
    }
    // the corpus has no raw-byte copies (its planted dups differ before
    // canonicalization), so the positive control is a planted frame:
    // three byte-identical images + one distinct must report one dup pair
    import spark.implicits._
    val planted = Seq(
      ("image", "samebytes"), ("image", "samebytes"), ("image", "samebytes"),
      ("image", "other")).toDF("modality", "payload_s")
      .select($"modality", org.apache.spark.sql.functions.encode($"payload_s", "UTF-8").as("payload"))
    val p = Multimodal.contentDedupStatsOf(planted).collect().head
    assert(p.getLong(1) == 4 && p.getLong(2) == 2 && p.getLong(3) == 2,
      s"planted dup screen wrong: $p")
    assert(p.getLong(4) == 9 * 3 + 5 && p.getLong(5) == 9 + 5, s"planted bytes wrong: $p")
  }

  test("decode kernel is deterministic and batch-shaped") {
    val feats = Multimodal.decodeAndFeaturize(Multimodal.mediaTable(spark, sf))
    val one = feats.filter(_.media_id == 0L).collect().head
    val again = Multimodal.decodeAndFeaturize(Multimodal.mediaTable(spark, sf))
      .filter(_.media_id == 0L).collect().head
    assert(one.checksum == again.checksum)
    assert(one.byte_histogram.length == 16)
    assert(math.abs(one.byte_histogram.sum - 1.0f) < 1e-3)
  }

  test("frame sampling takes every 4th 64-byte window of video payloads") {
    val media = Multimodal.mediaTable(spark, sf).filter(_.modality == "video").collect()
    val frames = Multimodal.frameSample(Multimodal.mediaTable(spark, sf)).collect()
      .groupBy(_.getLong(0))
    media.foreach { m =>
      val nWindows = math.ceil(m.payload.length / 64.0).toInt
      val expect = (0 until nWindows).count(_ % 4 == 0)
      val got = frames.get(m.media_id).map(_.length).getOrElse(0)
      assert(got == expect, s"media ${m.media_id}: $got != $expect")
    }
  }

  test("png payloads are REAL PNGs and ImageIO decode round-trips every planted pixel") {
    val pngs = Multimodal.pngTable(spark, sf).collect()
    assert(pngs.nonEmpty)
    // genuine PNG container: magic bytes, not a fake
    pngs.take(20).foreach { p =>
      assert((p.payload(0) & 0xff) == 0x89 && p.payload(1) == 'P' &&
             p.payload(2) == 'N' && p.payload(3) == 'G',
        s"media ${p.media_id} payload is not a PNG")
    }
    // driver-side ImageIO decode of a sample must reproduce the planted
    // formula pixel-for-pixel (the distributed kernel runs the same code;
    // the oracle row proves it corpus-wide via the channel sums)
    pngs.take(5).foreach { p =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p.payload))
      val (w, h) = Multimodal.plantedDims(p.media_id)
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = Multimodal.plantedRgb(p.media_id, x, y)
        val px = img.getRGB(x, y)
        assert(((px >> 16) & 0xff) == r && ((px >> 8) & 0xff) == g && (px & 0xff) == b,
          s"media ${p.media_id} pixel ($x,$y) corrupted by the codec round-trip")
      }
    }
  }

  test("decode kernel survives an undecodable payload as a decode_ok=0 row") {
    import spark.implicits._
    val junk = Seq(
      Multimodal.PngRow(1L, Array[Byte](1, 2, 3, 4, 5)),
      Multimodal.PngRow(2L, Array.emptyByteArray))
    val out = Multimodal.decodePng(junk.toDS()).collect().sortBy(_.media_id)
    assert(out.forall(f => f.decode_ok == 0L && f.width == -1L && f.n_pixels == 0L),
      s"corrupt payloads must surface as decode_ok=0, got ${out.toSeq}")
  }

  test("jpeg payloads are REAL JPEGs; quantizer error is deep inside the gated bound") {
    val jpegs = Multimodal.jpegTable(spark, sf).collect()
    assert(jpegs.nonEmpty)
    jpegs.take(20).foreach { p =>
      assert((p.payload(0) & 0xff) == 0xff && (p.payload(1) & 0xff) == 0xd8,
        s"media ${p.media_id} payload is not a JPEG (no SOI marker)")
    }
    // measure the REAL max per-channel error on a sample: the err_bounded
    // gate uses JpegErrBound=32; the observed error on the planted smooth
    // plane must sit well under it, or the bound is doing no work
    val maxErr = jpegs.take(10).map { p =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p.payload))
      val (w, h) = Multimodal.plantedDims(p.media_id)
      assert(img.getWidth == w && img.getHeight == h, "JPEG geometry not preserved")
      (for (y <- 0 until h; x <- 0 until w) yield {
        val want = Multimodal.plantedLuma(p.media_id, x, y)
        val px = img.getRGB(x, y)
        Seq((px >> 16) & 0xff, (px >> 8) & 0xff, px & 0xff)
          .map(c => math.abs(c - want)).max
      }).max
    }.max
    assert(maxErr <= Multimodal.JpegErrBound / 2,
      s"observed JPEG error $maxErr too close to the gated bound ${Multimodal.JpegErrBound}")
  }

  test("jpeg/wav kernels fail visible on corrupt payloads") {
    import spark.implicits._
    val junkImg = Seq(Multimodal.PngRow(1L, Array[Byte](9, 9, 9))).toDS()
    val j = Multimodal.decodeJpeg(junkImg).collect()
    assert(j.head.decode_ok == 0L && !j.head.err_bounded)
    val junkWav = Seq(Multimodal.WavRow(1L, Array[Byte](0, 1, 2, 3))).toDS()
    val a = Multimodal.decodeWav(junkWav).collect()
    assert(a.head.decode_ok == 0L && a.head.sample_rate == -1L)
  }

  test("wav payloads are REAL RIFF/WAVE files and round-trip every planted sample") {
    val wavs = Multimodal.wavTable(spark, sf).collect()
    assert(wavs.nonEmpty)
    wavs.take(20).foreach { p =>
      val hdr = new String(p.payload.take(4)) + new String(p.payload.slice(8, 12))
      assert(hdr == "RIFFWAVE", s"media ${p.media_id} is not a RIFF/WAVE file")
    }
    wavs.take(5).foreach { p =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(p.payload))
      val bytes = ais.readAllBytes()
      val n = Multimodal.plantedSampleCount(p.media_id)
      assert(bytes.length == n * 2, s"media ${p.media_id}: sample count changed")
      (0 until n).foreach { i =>
        val v = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
        assert(v == Multimodal.plantedSample(p.media_id, i),
          s"media ${p.media_id} sample $i corrupted by the codec round-trip")
      }
    }
  }
}

class UnigramTokenizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("Viterbi kernel equals exhaustive enumeration over all segmentations") {
    // deterministic pseudo-random vocab over a 4-letter alphabet: every
    // single char plus a scattering of multi-char pieces with varied costs
    val alphabet = "abcd"
    val rng = new scala.util.Random(42)
    val vocab = new java.util.HashMap[String, java.lang.Long]()
    alphabet.foreach(c => vocab.put(c.toString, java.lang.Long.valueOf(900000L + rng.nextInt(200000))))
    val words = (1 to 60).map(_ => (1 to (1 + rng.nextInt(9))).map(_ => alphabet(rng.nextInt(4))).mkString)
    words.flatMap(w => (0 until w.length).flatMap(s =>
        (2 to math.min(6, w.length - s)).map(l => w.substring(s, s + l))))
      .distinct.foreach { p =>
        if (rng.nextBoolean()) vocab.put(p, java.lang.Long.valueOf(300000L + rng.nextInt(1500000)))
      }
    // exhaustive: enumerate every split into vocab pieces (<=6 chars),
    // min by (cost, n_pieces) — the spec-level truth uniViterbi must match
    def brute(w: String): Long = {
      if (w.isEmpty) return 0L
      var best = Long.MaxValue
      for (k <- 1 to math.min(6, w.length)) {
        val c = vocab.get(w.substring(0, k))
        if (c ne null) {
          val rest = brute(w.substring(k))
          if (rest != Long.MaxValue) {
            val cand = c.longValue() * 1024L + 1L + rest
            if (cand < best) best = cand
          }
        }
      }
      best
    }
    words.foreach { w =>
      val got = graft.operators.TextAnalysis.uniViterbi(w, vocab)
      assert(got == brute(w), s"word '$w': viterbi $got != exhaustive ${brute(w)}")
    }
  }

  test("unigram tokenization is consistent: n_words <= n_tokens <= corpus chars") {
    val rows = graft.operators.TextAnalysis.unigramTokenize(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, t, c) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(t >= n, s"${r.getString(0)}: fewer pieces than words")
      assert(c > 0L, s"${r.getString(0)}: non-positive total cost")
    }
  }

  test("WordPiece greedy kernel: longest-match reference + fewest-pieces lower bound") {
    val alphabet = "abcd"
    val rng = new scala.util.Random(7)
    val pieces = new java.util.HashSet[String]()
    alphabet.foreach(c => pieces.add(c.toString))
    val words = (1 to 80).map(_ =>
      (1 to (1 + rng.nextInt(9))).map(_ => alphabet(rng.nextInt(4))).mkString)
    words.flatMap(w => (0 until w.length).flatMap(s =>
        (2 to math.min(6, w.length - s)).map(l => w.substring(s, s + l))))
      .distinct.foreach { p =>
        if (rng.nextBoolean()) pieces.add(p)
      }
    // straight-line reference: repeatedly take the longest vocab prefix
    def ref(w: String): Long = {
      var rest = w; var n = 0L
      while (rest.nonEmpty) {
        val k = (math.min(6, rest.length) to 1 by -1)
          .find(l => pieces.contains(rest.substring(0, l))).get
        rest = rest.substring(k); n += 1L
      }
      n
    }
    // fewest-pieces DP over the same piece set — the true lower bound for
    // ANY segmentation (the cost-optimal Viterbi is NOT: minimizing cost
    // can legitimately use more pieces than greedy)
    def minPieces(w: String): Long = {
      val dp = Array.fill(w.length + 1)(Long.MaxValue / 2)
      dp(0) = 0L
      for (i <- 1 to w.length; k <- 1 to math.min(6, i))
        if (pieces.contains(w.substring(i - k, i)))
          dp(i) = math.min(dp(i), dp(i - k) + 1L)
      dp(w.length)
    }
    words.foreach { w =>
      val greedy = graft.operators.TextAnalysis.wpGreedy(w, pieces)
      assert(greedy == ref(w), s"word '$w': greedy $greedy != reference ${ref(w)}")
      assert(greedy >= minPieces(w),
        s"word '$w': greedy $greedy pieces beat the fewest-pieces DP ${minPieces(w)}")
      assert(greedy <= w.length.toLong, s"word '$w': more pieces than chars")
    }
  }

  test("wordpiece corpus rollup: same word base as unigram, bounded piece counts") {
    val sf = "/root/testdata/sf0.001"
    val wp = graft.operators.TextAnalysis.wordpieceTokenize(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val uni = graft.operators.TextAnalysis.unigramTokenize(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(wp.keySet == uni.keySet)
    wp.foreach { case (lang, (nw, nt, nc)) =>
      val (unw, _) = uni(lang)
      assert(nw == unw, s"$lang: word counts diverge between tokenizers")
      assert(nt >= nw && nt <= nc,
        s"$lang: piece count outside [n_words, n_chars] = [$nw, $nc]: $nt")
    }
  }
}

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("count-min sketch never under-counts and stays within its bound") {
    val sf = "/root/testdata/sf0.01"
    val rows = TextAnalysis.vocabCms(spark, sf).collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      val (exact, est, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= exact, s"CMS under-counted '${r.getString(0)}': $est < $exact")
      assert(over == est - exact)
      assert(r.getBoolean(4), s"'${r.getString(0)}' over-count $over beyond the 2N/w bound")
    }
    // estimates agree with the exact top-k table on the ranking input
    val topk = TextAnalysis.vocabTopK(spark, sf, 30).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(topk(r.getString(0)) == r.getLong(1)))
  }

  test("PMI collocations: counts honest, micro-nat scores match a driver recount") {
    val sf = "/root/testdata/sf0.001"
    val rows = TextAnalysis.pmiCollocations(spark, sf).collect()
    assert(rows.length == 50)
    // independent count base: token stream recomputed from the raw corpus
    val toks = Tables.documents(spark, sf)
      .select(TextAnalysis.wsTokens(TextAnalysis.canonical($"text")).as("w"))
      .collect().map(_.getSeq[String](0))
    val uni = toks.flatten.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val big = toks.flatMap(w => w.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (p, g) => p -> g.size.toLong }
    val nTot = uni.values.sum.toDouble
    val bTot = big.values.sum.toDouble
    rows.foreach { r =>
      val (x, y, cxy, cx, cy, pmi) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(cxy >= 5 && big((x, y)) == cxy && uni(x) == cx && uni(y) == cy)
      val expect = math.round(math.log((cxy.toDouble * nTot * nTot) /
        (bTot * cx * cy)) * 1000000.0)
      assert(pmi == expect, s"pmi mismatch for ($x,$y): $pmi != $expect")
    }
    // scores arrive in presentation order
    assert(rows.map(_.getLong(5)).toSeq == rows.map(_.getLong(5)).sortBy(-_).toSeq)
  }

  test("TF-IDF keywords: top-3 per doc, descending, corpus-wide terms score ~0") {
    val sf = "/root/testdata/sf0.001"
    val rows = TextAnalysis.tfidfKeywords(spark, sf).collect()
    val docs = Tables.documents(spark, sf).count()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.size == docs, "every document has keywords")
    byDoc.foreach { case (id, rs) =>
      assert(rs.length <= 3 && rs.map(_.getAs[Int]("r")).sorted.toSeq == (1 to rs.length))
      val scores = rs.sortBy(_.getAs[Int]("r")).map(_.getAs[Long]("score"))
      assert(scores.toSeq == scores.sortBy(-_).toSeq, s"doc $id scores not descending")
    }
    // idf = ln(D/df) ≥ 0 with df ≤ D; scores are exact integer products
    rows.foreach { r =>
      assert(r.getAs[Long]("idf_micro") >= 0L)
      assert(r.getAs[Long]("score") == r.getAs[Long]("tf") * r.getAs[Long]("idf_micro"))
    }
  }

  test("token entropy matches a driver-side exact replay and is bounded by ln V") {
    val sf = "/root/testdata/sf0.001"
    val counts = Tables.documents(spark, sf)
      .select($"lang", explode(TextAnalysis.wsTokens(TextAnalysis.canonical($"text"))).as("t"))
      .filter($"t" =!= "").groupBy($"lang", $"t").count().collect()
      .map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).map { case (l, rs) => l -> rs.map(_._2) }
    TextAnalysis.tokenEntropy(spark, sf).collect().foreach { r =>
      val cs = counts(r.getAs[String]("lang"))
      val n = cs.sum
      val sumClnc = cs.map(c => BigInt(c) * math.round(math.log(c.toDouble) * 1e6)).sum
      val h = math.round(math.log(n.toDouble) * 1e6) - (sumClnc / n).toLong
      assert(r.getAs[Long]("n_tokens") == n)
      assert(r.getAs[Long]("vocab") == cs.length)
      assert(r.getAs[Long]("entropy_micro") == h, s"${r.get(0)} entropy mismatch")
      val lnV = math.round(math.log(cs.length.toDouble) * 1e6)
      assert(r.getAs[Long]("norm_entropy_micro") == h * 1000000L / lnV)
      assert(h >= 0 && h <= lnV, "0 <= H <= ln V")
    }
  }

  test("Zipf fit matches an exact driver-side OLS replay") {
    val sf = "/root/testdata/sf0.001"
    val r = TextAnalysis.zipfFit(spark, sf).collect().head
    // independent replay: counts -> ranks -> micro-nat axes -> integer OLS
    val freqs = Tables.documents(spark, sf)
      .select(explode(TextAnalysis.wsTokens(TextAnalysis.canonical($"text"))).as("t"))
      .filter($"t" =!= "").groupBy($"t").count().collect()
      .map(x => (x.getString(0), x.getLong(1)))
      .sortBy { case (t, f) => (-f, t) }.take(100)
    val xy = freqs.zipWithIndex.map { case ((_, f), i) =>
      (math.round(math.log(i + 1.0) * 1e6), math.round(math.log(f.toDouble) * 1e6))
    }
    val n = BigInt(xy.length)
    val sx = xy.map(p => BigInt(p._1)).sum; val sy = xy.map(p => BigInt(p._2)).sum
    val sxy = xy.map(p => BigInt(p._1) * p._2).sum
    val sxx = xy.map(p => BigInt(p._1) * p._1).sum
    val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
    val slope = (num.signum * ((num.abs * 1000000) / den)).toLong
    assert(r.getAs[Long]("n_terms") == xy.length)
    assert(r.getAs[Long]("slope_micro") == slope,
      s"slope ${r.getAs[Long]("slope_micro")} != replay $slope")
    val r2 = r.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0)
  }

  test("gopher rule verdicts are consistent with their signals and discriminate") {
    val rows = TextAnalysis.gopherRules(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (nWords, mwl, sym, alpha, nStop) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5))
      assert(r.getBoolean(6) == (nWords >= 50 && nWords <= 100000))
      assert(r.getBoolean(7) == (mwl >= 3.0 && mwl <= 10.0))
      assert(r.getBoolean(8) == (sym <= 0.1))
      assert(r.getBoolean(9) == (alpha >= 0.8))
      assert(r.getBoolean(10) == (nStop >= 2))
      assert(r.getBoolean(11) == (6 to 10).forall(r.getBoolean))
      assert(mwl > 0 && alpha >= 0.0 && alpha <= 1.0 && sym >= 0.0)
    }
    val kept = rows.count(_.getBoolean(11))
    assert(kept > 0 && kept < rows.length, s"gopher rules degenerate: kept=$kept")
    // both discriminating rules actually fire on this corpus
    assert(rows.exists(!_.getBoolean(6)) && rows.exists(!_.getBoolean(10)))
  }

  test("filter funnel conserves documents and chains stage-to-stage") {
    val sfq = "/root/testdata/sf0.01"
    val rows = TextAnalysis.filterFunnel(spark, sfq).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getString(1)).toSeq == Seq("rule_words", "rule_word_len",
      "rule_symbols", "rule_alpha", "rule_stopwords"))
    val total = TextAnalysis.gopherRules(spark, sfq).count()
    assert(rows.head.getLong(2) == total, "stage 1 n_in must be the corpus size")
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3), "n_dropped != n_in - n_out")
      assert(r.getLong(3) <= r.getLong(2), "survivors exceed entrants")
    }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b.getLong(2) == a.getLong(3), "funnel stages don't chain")
      case _ =>
    }
    // conservation: drops across stages + final survivors = corpus
    assert(rows.map(_.getLong(4)).sum + rows.last.getLong(3) == total)
    // final survivors equal the conjunction keep-count of the rule bundle
    val kept = TextAnalysis.gopherRules(spark, sfq)
      .filter(org.apache.spark.sql.functions.col("keep")).count()
    assert(rows.last.getLong(3) == kept)
  }

  test("BPE merge loop learns a well-formed, deterministic merge table") {
    val sf = "/root/testdata/sf0.001"
    val merges = TextAnalysis.bpeLearn(spark, sf).collect()
    assert(merges.length == 8)
    merges.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("rank") == i + 1)
      val pair = r.getAs[String]("pair")
      // a merge is always of exactly two existing tokens
      assert(pair.count(_ == ' ') == 1, s"malformed pair '$pair'")
      assert(r.getAs[String]("merged") == pair.replace(" ", ""))
      assert(r.getAs[Long]("cnt") > 0)
    }
    // the best pair count can only shrink as merges consume occurrences
    val counts = merges.map(_.getAs[Long]("cnt"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"counts not non-increasing: ${counts.toSeq}")
    // later merges may build on earlier ones (that is the point of the
    // loop vs the single-step pair statistic) — at minimum the table has
    // no duplicate merges
    assert(merges.map(_.getAs[String]("pair")).distinct.length == 8)
    // deterministic re-run
    val again = TextAnalysis.bpeLearn(spark, sf).collect()
    assert(again.map(_.toSeq).toSeq == merges.map(_.toSeq).toSeq)
  }

  test("BPE apply compresses: more merges, fewer tokens, never below word count") {
    val sf = "/root/testdata/sf0.001"
    def totals(n: Int): (Long, Long) = {
      val rows = TextAnalysis.bpeApply(spark, sf, nMerges = n).collect()
      (rows.map(_.getAs[Long]("n_words")).sum, rows.map(_.getAs[Long]("n_tokens")).sum)
    }
    val (w0, t0) = totals(0) // character tokenization
    val (w8, t8) = totals(8)
    assert(w0 == w8, "word universe must not depend on the merge count")
    assert(t8 < t0, s"8 merges did not compress: $t8 vs $t0")
    assert(t8 >= w8, "a word can never tokenize to fewer than one piece")
  }

  test("langid heuristic identifies hand-written sentences") {
    val samples = Seq(
      (1L, "the cat is on the mat and the dog is in the house", "en"),
      (2L, "el perro está en la casa de los niños que juegan", "es"),
      (3L, "le chat est dans la maison avec les enfants et une pomme", "fr"),
      (4L, "der Hund ist in das Haus und die Katze ist auch da", "de"),
      (5L, "我是一个学生，他不在家里，我的朋友是老师", "zh"))
    val df = samples.toDF("doc_id", "text", "lang")
    df.createOrReplaceTempView("documents_tmp")
    // reuse the scoring internals via a temp table read
    val padded = concat(lit(" "), lower($"text"), lit(" "))
    val scoreCols = Seq($"doc_id", $"lang") ++
      TextAnalysis.langProfiles.toSeq.sortBy(_._1).map { case (l, grams) =>
        grams.map(g => (length(padded) - length(regexp_replace(padded,
          java.util.regex.Pattern.quote(g), ""))) / lit(math.max(1, g.length)))
          .reduce(_ + _).as(s"score_$l")
      }
    val scored = df.select(scoreCols: _*).collect()
    scored.foreach { r =>
      val want = r.getAs[String]("lang")
      val scores = TextAnalysis.langProfiles.keys.toSeq.sorted
        .map(l => l -> r.getAs[Number](s"score_$l").doubleValue())
      val best = scores.maxBy(_._2)._1
      assert(best == want, s"doc ${r.getLong(0)}: predicted $best, want $want ($scores)")
    }
  }

  test("canonicalization collapses case/punct/whitespace") {
    val df = Seq(("Hello,  WORLD! 42x")).toDF("text")
      .select(TextAnalysis.canonical($"text").as("c"))
    assert(df.head().getString(0) == "hello world 42x")
  }

  test("native expressions run through whole-stage codegen (no fallback)") {
    // fallback=false makes janino compile errors fatal instead of silently
    // reverting to interpreted eval
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // parquet-backed input so the projection really plans a codegen stage
      // (a literal Seq constant-folds to a LocalRelation with no codegen)
      val toks = TextAnalysis.wsTokens(TextAnalysis.canonical($"text"))
      val df = graft.Tables.documents(spark, "/root/testdata/sf0.001")
        .filter($"doc_id" <= 4)
        .select(
          Expressions.simhash60(toks).as("sh"),
          Expressions.minhashSigFromWords(toks, 5, 32).as("sig"),
          Expressions.shingleHashes(toks, 5).as("shs"),
          Expressions.charNgrams($"text", 3).as("grams"),
          Expressions.cosineSim(typedLit(Seq(1.0, 2.0)), typedLit(Seq(2.0, 1.0))).as("cos"),
          Expressions.cosineSim(typedLit(Seq(1.0, 2.0)), typedLit(Seq(0.0, 0.0))).as("cos_null"),
          Expressions.lshBucket(typedLit(Seq(1.0, 2.0)), 6, 0).as("bkt"),
          Expressions.hamming64(Expressions.simhash60(toks), Expressions.simhash60(toks)).as("ham"),
          Expressions.dupGramFraction(toks, 2).as("dup2"))
      val r = df.head()
      assert(r.getAs[scala.collection.Seq[Long]]("sig").length == 32)
      assert(r.getAs[scala.collection.Seq[Long]]("shs").nonEmpty)
      assert(math.abs(r.getAs[Double]("cos") - 0.8) < 1e-12)
      assert(r.isNullAt(r.fieldIndex("cos_null")))
      assert(r.getAs[scala.collection.Seq[String]]("grams").nonEmpty)
      assert(r.getAs[Int]("ham") == 0)
      val dup2 = r.getAs[Double]("dup2")
      assert(dup2 >= 0.0 && dup2 < 1.0)
      // the generated code calls the static kernels directly
      val gen = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
      assert(gen.contains("SketchKernels"), s"kernels not in generated code:\n${gen.take(2000)}")
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }
}
