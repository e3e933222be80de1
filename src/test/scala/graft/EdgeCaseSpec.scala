package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Pii, TextAnalysis}

/** Pathological-document robustness: at 100 TB the corpus WILL contain
  * empty strings, whitespace runs, unicode, emoji, punctuation-only and
  * megaword documents — every text operator must process them without
  * throwing and with sane (bounded, non-null) signals. The driver tables
  * are clean by construction, so this spec builds its own hostile
  * documents.parquet and runs the text surface over it. */
class EdgeCaseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-edge").toString
    val docs = Seq(
      (0L, "", "en", "src0"),                                   // empty
      (1L, "hello", "en", "src0"),                              // single word
      (2L, "!!! ??? ... --- ###", "en", "src1"),                // punctuation only
      (3L, "héllo wörld 你好世界 🙂", "zz", "src1"), // unicode + emoji
      (4L, ("lorem ipsum dolor sit amet " * 2000).trim, "en", "src2"), // 10k words
      (5L, ("spam " * 500).trim, "en", "src2"),                 // one repeated word
      (6L, "   \t  \n ", "en", "src3"),                         // whitespace only
      (7L, "123 456 789 000", "en", "src3"))                    // digits only
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
    docs.write.mode("overwrite").parquet(s"$out/documents.parquet")
    // hostile embeddings: a zero vector, a negative-component vector, and
    // a dimension mismatch within one label
    Seq((0L, Seq(0f, 0f, 0f), 0), (1L, Seq(1.25f, -2.5f, 3f), 0),
        (2L, Seq(0.5f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    out
  }

  test("drift monitors and quality checks survive hostile and degenerate corpora") {
    import spark.implicits._
    // the shared hostile corpus (nulls absent but empty/unicode present)
    val psi = graft.operators.Eval.driftPsi(spark, dir).collect()
    assert(psi.nonEmpty && psi.forall(r => !r.isNullAt(6)))
    val ks = graft.operators.Eval.driftKs(spark, dir).collect()
    assert(ks.length == 1 && ks.head.getAs[Long]("ks_micro") >= 0L)
    val chi = graft.operators.Eval.driftChi2(spark, dir).collect()
    assert(chi.nonEmpty && chi.forall(r => !r.isNullAt(5) && r.getLong(5) >= 0L))
    val qc = graft.operators.Pipeline.qualityChecks(spark, dir).collect()
    assert(qc.length == 8)
    // degenerate: a ONE-document corpus — the baseline snapshot is empty;
    // PSI smoothing keeps every contribution finite, KS is undefined and
    // must surface as a null statistic (div by an empty sample), never a
    // throw
    val one = java.nio.file.Files.createTempDirectory("graft-edge1").toString
    Seq((0L, "only doc", "en", "s0", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$one/documents.parquet")
    val psi1 = graft.operators.Eval.driftPsi(spark, one).collect()
    assert(psi1.length == 2 && psi1.forall(r => !r.isNullAt(6)))
    val ks1 = graft.operators.Eval.driftKs(spark, one).collect()
    assert(ks1.length == 1 && ks1.head.isNullAt(0))
    // chi2 on an empty baseline snapshot: NULL statistics, never a div0
    val chi1 = graft.operators.Eval.driftChi2(spark, one).collect()
    assert(chi1.length == 2 && chi1.forall(r => r.isNullAt(4) && r.isNullAt(5)))
    // mcnemar with an EMPTY test half (the one doc is train-side):
    // zero paired rows, all counts zero/NULL, statistic NULL — no throw
    val mc1 = graft.operators.Eval.mcnemar(spark, one).collect()
    assert(mc1.length == 1 && mc1.head.getAs[Long]("n") == 0L
      && mc1.head.isNullAt(5))
    // the drained streaming chi2 twin on the hostile corpus equals the
    // batch monitor row-for-row (same arithmetic, same input set)
    val chiB = graft.operators.Eval.driftChi2(spark, dir).collect().toSeq
    val chiS = graft.operators.StreamQueries.streamChi2(spark, dir).collect().toSeq
    assert(chiS == chiB, s"stream chi2 diverged from batch:\n$chiS\nvs\n$chiB")
  }

  test("stats / quality / gopher / repetition survive hostile documents") {
    val stats = TextAnalysis.textStats(spark, dir).collect()
    assert(stats.length == 8)
    val quality = TextAnalysis.qualityScore(spark, dir).collect()
    assert(quality.length == 8)
    quality.foreach { r =>
      val q = r.getDouble(r.fieldIndex("quality"))
      assert(q >= 0.0 && q <= 1.0, s"doc ${r.getLong(0)} quality $q out of [0,1]")
    }
    val gopher = TextAnalysis.gopherRules(spark, dir).collect()
    assert(gopher.length == 8)
    gopher.foreach { r =>
      assert(!r.anyNull, s"gopher row has nulls: $r")
      val frac = r.getDouble(r.fieldIndex("alpha_frac"))
      assert(frac >= 0.0 && frac <= 1.0)
      // the single-word doc fails the 50-word floor; the 10k-word doc
      // sits inside Gopher's [50, 100000] band
      if (r.getLong(0) == 1L) assert(!r.getBoolean(r.fieldIndex("rule_words")))
      if (r.getLong(0) == 4L) assert(r.getBoolean(r.fieldIndex("rule_words")))
    }
    val rep = TextAnalysis.repetition(spark, dir).collect()
    assert(rep.length == 8)
    // the all-one-word doc is pure repetition; singletons are not
    val repMap = rep.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(repMap(5L) > 0.9, s"spam doc dup fraction ${repMap(5L)}")
    assert(repMap(1L) == 0.0)
  }

  test("readability equals an exact driver replay incl. hostile documents") {
    val got = TextAnalysis.readability(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.size == 8)
    Tables.documents(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .foreach { case (id, text) =>
        val canon = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        val words = canon.split(" +", -1)
        val nw = words.length.toLong
        val sent = math.max(1, "[.!?]+".r.findAllIn(text).length).toLong
        val syll = words.map(w =>
          math.max(1L, "[aeiouy]+".r.findAllIn(w).length.toLong)).sum
        val wps = 1000000L * nw / sent
        val spw = 1000000L * syll / nw
        val flesch = 206835000L - (1015L * wps) / 1000 - (846L * spw) / 10
        assert(got(id) == ((nw, sent, syll, wps, spw, flesch)),
          s"doc $id: got=${got(id)} exp=${(nw, sent, syll, wps, spw, flesch)}")
      }
  }

  test("fingerprints, language id, vocab and profile survive hostile documents") {
    val fp = TextAnalysis.fingerprints(spark, dir).collect()
    assert(fp.length == 8 && fp.forall(!_.anyNull))
    // distinct content → distinct canonical keys; empty, whitespace-only
    // and punctuation-only all collapse to the canonical empty string —
    // that IS the semantics (3 docs share one key → 6 distinct keys)
    val keys = fp.map(_.getString(1))
    assert(keys.distinct.length == 6)
    assert(TextAnalysis.langId(spark, dir).collect().length == 8)
    assert(TextAnalysis.vocabTopK(spark, dir, 10).collect().nonEmpty)
    assert(TextAnalysis.profile(spark, dir).collect().length == 5)
  }

  test("dedup sketches and PII redaction survive hostile documents") {
    // signatures must compute for every doc, including empty/whitespace
    val sigs = Tables.documents(spark, dir)
      .select(col("doc_id"), Dedup.minhashSignature(col("text")).as("sig"),
              Dedup.shingleHashes(col("text")).as("sh"))
      .collect()
    assert(sigs.length == 8 && sigs.forall(!_.anyNull))
    // one row per canonical key: empty (0), punct-only (2) and
    // whitespace-only (6) form one 3-copy group kept by the lowest id
    val exact = Dedup.exact(spark, dir).collect()
    assert(exact.length == 6)
    val emptyGroup = exact.find(_.getLong(2) == 3L).get
    assert(emptyGroup.getLong(1) == 0L, s"empty-group keeper ${emptyGroup.getLong(1)}")
    val pii = Pii.redact(spark, dir).collect()
    assert(pii.length == 8 && pii.forall(r => r.getString(5) != null))
  }

  test("overlap family, kfold audit and embed audit survive hostile inputs") {
    // empty/punctuation/whitespace docs all canonicalize to the ""
    // shingle, so src0/src1/src3 share a hash — the matrix must see it
    // without throwing, with jaccard inside [0, 1e6]
    val exact = Dedup.sourceOverlap(spark, dir).collect()
    assert(exact.nonEmpty && exact.length <= 6)
    exact.foreach { r =>
      assert(r.getLong(2) >= 1, s"empty intersection row: $r")
      assert(r.getLong(5) >= 0 && r.getLong(5) <= 1000000L, s"jaccard out of range: $r")
    }
    // the sketch join is pairwise-complete (every source has a sketch)
    val kmv = Dedup.sourceOverlapKmv(spark, dir).collect()
    assert(kmv.length == 6)
    kmv.foreach(r => assert(r.getLong(3) <= r.getLong(2), s"n_both > k_used: $r"))
    // byte-identical "" docs are cross-source exact dups → the fold audit
    // has pairs to classify and every row counts at least one
    val folds = graft.operators.Pipeline.kfoldLeakage(spark, dir).collect()
    assert(folds.nonEmpty)
    folds.foreach(r => assert(r.getLong(2) >= 1))
    // embed audit: zero vector and intra-label dimension drift both
    // surface instead of crashing or averaging away
    val eq = graft.operators.Similarity.embedQuality(spark, dir).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(eq(0).getLong(4) == 1L, "zero vector not flagged")
    assert(eq(0).getLong(6) > 0L && eq(1).getLong(3) == 1L)
  }

  test("BM25 retrieval and NB classifier survive hostile documents") {
    // query docs include the empty doc (0), punct-only (2) and unicode (3):
    // empty/punct canonicalize to [""] which must NOT become a query term
    val bm25 = graft.operators.Similarity.bm25Retrieve(spark, dir).collect()
    assert(bm25.forall(_.getLong(2) > 0L), "non-positive BM25 score")
    assert(bm25.map(_.getLong(0)).distinct.forall(q => Set(1L, 3L, 4L)(q)),
      s"empty/punct query docs produced matches: ${bm25.map(_.getLong(0)).distinct.mkString(",")}")
    // classifier: every odd-id doc gets exactly one prediction, even the
    // whitespace-only doc (prior-only fallback path)
    val nb = graft.operators.TextAnalysis.nbClassify(spark, dir).collect()
    assert(nb.length == 4, s"expected 4 test docs, got ${nb.length}")
    assert(nb.map(_.getLong(0)).toSet == Set(1L, 3L, 5L, 7L))
    assert(nb.forall(r => r.getString(1) != null && r.getString(1).nonEmpty))
  }

  test("diff / compaction / phrase / wordpiece survive hostile and tiny corpora") {
    import spark.implicits._
    // hostile corpus: the only doc_id ≡ 1 (mod 50) is "hello" (1 token
    // < phrase length) — zero probes must mean an EMPTY result, no throw
    assert(graft.operators.Similarity.phraseSearch(spark, dir).collect().isEmpty)
    val wp = TextAnalysis.wordpieceTokenize(spark, dir).collect()
    assert(wp.nonEmpty && wp.forall { r =>
      r.getLong(2) >= r.getLong(1) && r.getLong(2) <= r.getLong(3) })
    val diff = graft.operators.Pipeline.snapshotDiff(spark, dir).collect()
    assert(diff.map(_.getLong(2)).sum >= 8L - 2L, "diff must cover the key universe")
    assert(diff.forall(r =>
      Set("added", "removed", "changed", "unchanged")(r.getString(0))))
    // one-document corpus: one file, one bin, totals conserve
    val one = java.nio.file.Files.createTempDirectory("graft-edge2").toString
    Seq((0L, "only doc", "en", "s0", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$one/documents.parquet")
    val bins = graft.operators.Pipeline.compactionPlan(spark, one).collect()
    assert(bins.length == 1 && bins.head.getAs[Long]("n_files") == 1L
      && bins.head.getAs[Long]("bin_bytes") == 8L)
  }

  private lazy val evDir: String = {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-edge-ev").toString
    // single-event user (42), all-same-type user (43), same-instant
    // attribute flip (44: view→click at one ms), purchase-before-any-
    // profile-event user (45) — every SCD2/as-of boundary case
    Seq(
      (0L, 1000L, 42L, "view", 1.0, "{}"),
      (10L, 1000L, 43L, "click", 2.0, "{}"),
      (11L, 2000L, 43L, "click", 3.0, "{}"),
      (12L, 3000L, 43L, "click", 4.0, "{}"),
      (20L, 1000L, 44L, "view", 5.0, "{}"),
      (21L, 1000L, 44L, "click", 6.0, "{}"),
      (22L, 1000L, 44L, "purchase", 7.5, "{}"),
      (30L, 500L, 45L, "purchase", 9.25, "{}"))
      .toDF("event_id", "ms", "user_id", "event_type", "value", "props")
      .select($"event_id", timestamp_millis($"ms").as("ts"), $"user_id",
              $"event_type", $"value", $"props")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/events.parquet")
    out
  }

  test("SCD2 family survives single-event, constant-attr and same-instant streams") {
    import graft.operators.Events
    val hist = Events.scd2History(spark, evDir).collect()
      .groupBy(_.getAs[Long]("user_id"))
    // single event: one open version
    assert(hist(42L).length == 1 && hist(42L).head.getAs[Boolean]("is_current"))
    // constant attribute: ONE version spanning all three events
    assert(hist(43L).length == 1 && hist(43L).head.getAs[Long]("n_events") == 3L)
    // same-instant flips (view/click/purchase all @1000): three versions,
    // event_id breaks the ties deterministically, intervals contiguous
    val u44 = hist(44L).sortBy(_.getAs[Long]("ver"))
    assert(u44.map(_.getAs[String]("attr")).toSeq ==
      Seq("view", "click", "purchase"))
    u44.sliding(2).foreach(p => assert(
      p(0).getAs[Long]("valid_to") == p(1).getAs[Long]("valid_from")))
    // as-of: user 45's purchase precedes any profile event → 'none'
    // bucket carries exactly that one purchase (925 cents)
    val asof = Events.asofAttribute(spark, evDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(asof("none") == ((1L, 925L)), s"got $asof")
    // user 44's same-instant purchase resolves against the same-ms click
    // version (inclusive as-of, max-ver dedup) in both engines' semantics
    assert(asof("click") == ((1L, 750L)), s"got $asof")
    // streaming twin emits exactly the batch closed versions (u44's
    // view and click; every other user's single version stays open)
    val streamed = graft.operators.StreamQueries.streamScd2(spark, evDir).collect()
    assert(streamed.length == 2 &&
      streamed.forall(_.getAs[Long]("user_id") == 44L) &&
      streamed.map(_.getAs[String]("attr")).toSeq == Seq("view", "click"))
    // regression eval: test half (odd ids) covers only user 43's clicks —
    // model trained on evens must score them without a throw
    val reg = graft.operators.Eval.regressionEval(spark, evDir).collect()
    assert(reg.length == 1 && reg.head.getString(0) == "click" &&
      reg.head.getAs[Long]("n_test") == 2L)
  }
}
