package graft

import org.apache.spark.sql.functions.{lit, pmod, size, sum, upper}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Pipeline, TextAnalysis}

/** End-to-end curation pipeline: filtering semantics + partitioned write
  * layout. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("quality checks flag planted violations and clear a clean corpus") {
    import spark.implicits._
    // planted corpus: doc 1 null text, doc 2 duplicated key, doc 3 lying
    // n_chars, doc 4 disallowed lang, doc 5 empty source — five distinct
    // constraint families violated at once
    val dir = java.nio.file.Files.createTempDirectory("qcheck").toString
    Seq(
      (1L, null.asInstanceOf[String], "en", "s0", 0L),
      (2L, "hello world", "en", "s0", 11L),
      (2L, "hello again", "en", "s0", 11L),
      (3L, "abc", "en", "s0", 99L),
      (4L, "bonjour", "xx", "s0", 7L),
      (5L, "text five", "en", "", 9L),
      (6L, "clean row here", "de", "s1", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rep = Pipeline.qualityChecks(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rep.size == 8)
    assert(rep("completeness_text") == (6L * 1000000L / 7L, false))
    assert(rep("uniqueness_doc_id") == (6L * 1000000L / 7L, false))
    assert(rep("consistency_n_chars") == (5L * 1000000L / 7L, false))
    assert(rep("compliance_lang") == (6L * 1000000L / 7L, false))
    assert(rep("completeness_source") == (6L * 1000000L / 7L, false))
    assert(rep("min_n_chars") == (0L, false))
    assert(rep("max_n_chars")._2 && rep("mean_n_chars_micro")._2)
    // the shipped corpus clears every gate except the deliberate
    // zh-exclusion compliance row
    val real = Pipeline.qualityChecks(spark, sf).collect()
      .map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(real.count(!_._2) == 1 && !real("compliance_lang"))
  }

  test("kfold leakage audit equals a driver-side fold-hash replay; folds are balanced") {
    def fold(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"fold|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 5
    }
    val pairs = Dedup.minhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
    val expected = pairs
      .map { case (a, b) => (math.min(fold(a), fold(b)), math.max(fold(a), fold(b))) }
      .groupBy(identity).toSeq
      .map { case ((lo, hi), g) => (lo, hi, g.length.toLong, lo != hi) }
      .sortBy(t => (t._1, t._2))
    val got = Pipeline.kfoldLeakage(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got == expected, s"leakage mismatch: got=$got exp=$expected")
    // the fold hash balances the corpus: no fold under half or over
    // double its uniform share
    val docs = graft.Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0))
    val sizes = docs.groupBy(fold).view.mapValues(_.length).toMap
    val share = docs.length / 5
    assert(sizes.size == 5 && sizes.values.forall(n => n >= share / 2 && n <= share * 2),
      s"fold imbalance: $sizes")
  }

  test("interleave manifest: contiguous positions, per-source order kept, prefixes proportional") {
    val rows = Pipeline.interleave(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val n = rows.length
    assert(rows.map(_._1).toSeq == (1L to n).toSeq, "positions not contiguous")
    // within each source the manifest preserves doc_id order (streaming
    // readers must see each shard in order)
    rows.groupBy(_._3).values.foreach { g =>
      val ids = g.sortBy(_._1).map(_._2)
      assert(ids.sameElements(ids.sorted), "per-source order broken")
    }
    // proportionality: every prefix holds each source within ±2 of its
    // proportional share (the virtual-time key's defining property)
    val w = rows.groupBy(_._3).view.mapValues(_.length).toMap
    val seen = scala.collection.mutable.HashMap.empty[String, Int].withDefaultValue(0)
    rows.sortBy(_._1).zipWithIndex.foreach { case ((_, _, src), i) =>
      seen(src) += 1
      val p = i + 1
      w.foreach { case (s0, ws) =>
        val share = p.toDouble * ws / n
        assert(math.abs(seen(s0) - share) <= 2.0 + share * 0.05,
          s"prefix $p: source $s0 has ${seen(s0)} vs share $share")
      }
    }
  }

  test("langid confusion matrix reconciles with per-doc predictions and shows diagonal mass") {
    val preds = TextAnalysis.langId(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val expected = preds.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = TextAnalysis.langIdConfusion(spark, sf).collect()
    val got = rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected, "confusion cells diverge from per-doc predictions")
    // row shares: each label's floors sum into (1e6 - cells, 1e6]
    rows.groupBy(_.getString(0)).foreach { case (lbl, g) =>
      val s0 = g.map(_.getLong(3)).sum
      assert(s0 <= 1000000L && s0 > 1000000L - g.length, s"label $lbl shares sum $s0")
      g.foreach(r => assert(r.getBoolean(4) == (r.getString(0) == r.getString(1))))
    }
    // the corpus's lang labels are decorative (every doc's text is the
    // same English-ish synthetic vocabulary), and the matrix must EXPOSE
    // that rather than flatter the classifier: predictions collapse onto
    // the latin-profile languages, so off-diagonal mass dominates for the
    // label rows whose text carries no signal
    assert(rows.exists(r => !r.getBoolean(4) && r.getLong(3) > 500000L),
      "expected the matrix to expose label/content mismatch on synthetic data")
  }

  test("e2e curation chain: monotone survivor hand-off, zero residual cache") {
    import spark.implicits._
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val rows = Pipeline.curationE2E(spark, sf).collect()
    assert(rows.length == 10, s"expected 10 stage rows, got ${rows.length}")
    // filter stages (1-8) must hand off exactly: stage k's n_in == stage
    // k-1's n_out, and survival never grows
    val byStage = rows.map(r => r.getLong(0) ->
      (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    (2 to 8).foreach { k =>
      assert(byStage(k.toLong)._2 == byStage(k - 1L)._3,
        s"stage $k n_in != stage ${k - 1} n_out")
    }
    (1 to 8).foreach { k =>
      assert(byStage(k.toLong)._3 <= byStage(k.toLong)._2,
        s"filter stage $k grew the corpus")
    }
    // pack and shard both consume stage 8's survivors
    assert(byStage(9L)._2 == byStage(8L)._3 && byStage(10L)._2 == byStage(8L)._3)
    // a degenerate chain (a stage wiping the corpus) is a composition bug
    // even when both engines agree on it
    assert(byStage(8L)._3 > 0, "curated corpus is empty — degenerate chain")
    // cache/detach discipline across stage boundaries: nothing the run
    // pinned (persists OR localCheckpoint RDD storage) may outlive it
    val pinnedAfter = spark.sparkContext.getPersistentRDDs.keySet -- pinnedBefore
    assert(pinnedAfter.isEmpty,
      s"e2e run left ${pinnedAfter.size} cached RDDs pinned: $pinnedAfter")
  }

  test("curated corpus = quality ∩ keepers ∖ near-dup losers") {
    import spark.implicits._
    val total = Tables.documents(spark, sf).count()
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val curated = Pipeline.curated(spark, sf).cache()
    val n = curated.count()
    assert(n > 0 && n <= total)
    // no surviving doc is a near-dup loser
    val losers = Dedup.minhashPairs(spark, sf, 0.8)
      .select($"doc_b").distinct().collect().map(_.getLong(0)).toSet
    val survivors = curated.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors.intersect(losers).isEmpty)
    // every survivor passes the quality bar
    val below = TextAnalysis.qualityScore(spark, sf)
      .filter($"quality" < 0.4).collect().map(_.getLong(0)).toSet
    assert(survivors.intersect(below).isEmpty)
    curated.unpersist()
    // the shared sketch base must not outlive the call (round-3 ADVICE):
    // survivor ids detach through Caching.detach, releasing every block
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- pinnedBefore
    assert(leaked.isEmpty, s"curated() left pinned RDD ids: $leaked")
  }

  test("temperature mixture flattens the language distribution") {
    val rows = Pipeline.temperatureMixture(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val byN = rows.sortBy(_._2)
    val (smallest, largest) = (byN.head, byN.last)
    // the biggest language keeps exactly targetFraction; smaller ones more
    assert(largest._4 == 0.5, s"largest-language rate ${largest._4}")
    assert(smallest._4 > largest._4, "small languages not upweighted")
    // realized keep shares flatten: small-lang share ≥ large-lang share
    val shareSmall = smallest._3.toDouble / smallest._2
    val shareLarge = largest._3.toDouble / largest._2
    assert(shareSmall > shareLarge,
      s"mixture did not flatten: $shareSmall vs $shareLarge")
    // hash sampling lands near the configured rate
    rows.foreach { case (lang, n, kept, rate) =>
      assert(math.abs(kept.toDouble / n - rate) < 0.25,
        s"$lang keep fraction ${kept.toDouble / n} far from rate $rate")
    }
  }

  test("weighted sample: A-ES priorities match a driver md5 recount, weight tilts selection") {
    val rows = Pipeline.weightedSample(spark, sf).collect()
    assert(rows.length == 64)
    // priorities arrive ascending with doc_id tie-break
    val pris = rows.map(r => (r.getAs[Long]("priority"), r.getAs[Long]("doc_id")))
    assert(pris.toSeq == pris.sortBy(identity).toSeq)
    // exact replay of the key chain: md5-fold uniform -> micro-nat ln -> integer div
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val hex = md.digest(s"wrs|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(7)
      val u = java.lang.Long.parseLong(hex, 16) % 999999L + 1L
      assert(r.getAs[Long]("u_micro") == u, s"doc $id uniform mismatch")
      val lnu = math.round(math.log(u / 1000000.0) * 1000000.0)
      val expect = (-lnu * 1000000L) / r.getAs[Long]("n_chars")
      assert(r.getAs[Long]("priority") == expect, s"doc $id priority mismatch")
    }
    // weight tilt: sampled docs are longer on average than the corpus
    val corpusMean = Tables.documents(spark, sf)
      .agg(org.apache.spark.sql.functions.avg(
        org.apache.spark.sql.functions.col("n_chars"))).head.getDouble(0)
    val sampleMean = rows.map(_.getAs[Long]("n_chars")).sum.toDouble / rows.length
    assert(sampleMean > corpusMean,
      s"length-weighted sample not tilted: $sampleMean <= $corpusMean")
  }

  test("shard manifest: full cover, balanced, deterministic across runs") {
    val rows = Pipeline.shardManifest(spark, sf).collect()
    assert(rows.map(_.getLong(0)).sorted.sameElements(0L until 8L))
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total, "shards must cover the corpus")
    // uniform key hash ⇒ every shard within ±60% of the mean even at tiny SF
    val mean = total.toDouble / 8
    rows.foreach(r => assert(math.abs(r.getLong(1) - mean) <= mean * 0.6,
      s"shard ${r.getLong(0)} holds ${r.getLong(1)} docs vs mean $mean"))
    val again = Pipeline.shardManifest(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("epoch shuffle: per-epoch permutation, epochs differ, deterministic, no funnel") {
    import spark.implicits._
    val n = Tables.documents(spark, sf).count()
    val rows = Pipeline.epochShuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == n * 3)
    // every epoch is a true permutation: positions 1..n once, all docs once
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    byEpoch.values.foreach { es =>
      assert(es.map(_._2).sorted.sameElements(1L to n))
      assert(es.map(_._3).distinct.length == n.toInt)
    }
    // the permutations genuinely differ across epochs (not a shifted copy)
    def order(e: Long) = byEpoch(e).sortBy(_._2).map(_._3).toSeq
    assert(order(0L) != order(1L) && order(1L) != order(2L))
    // deterministic: a second build reproduces the manifest exactly
    val again = Pipeline.epochShuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.sameElements(again))
    // scale shape: the rank comes from runningTotal — per-range windows +
    // a broadcast offset join, never a corpus-wide single-partition sort
    val p = Pipeline.epochShuffle(spark, sf).queryExecution.executedPlan.toString
    val funnels = "Exchange SinglePartition".r.findAllIn(p).length
    val metaWindows = "Window".r.findAllIn(p).length
    assert(p.contains("BroadcastExchange"), s"offset join lost its broadcast:\n$p")
    // the only SinglePartition exchanges allowed are the P-row metadata
    // window and the presentation sort feed — both driver-scale
    assert(funnels <= 2 && metaWindows >= 1, s"epoch shuffle funnels:\n$p")
  }

  test("sharded write: shard=* directories, round-trip, assignment stable") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("sharded").toString
    Pipeline.shardedWrite(spark, sf, out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.length == 8 && dirs.forall(_.startsWith("shard=")), s"layout: ${dirs.toSeq}")
    val back = spark.read.parquet(out)
    assert(back.count() == Tables.documents(spark, sf).count())
    // physical placement matches the manifest's logical assignment
    val manifest = Pipeline.shardManifest(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val physical = back.groupBy($"shard".cast("long").as("shard")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(physical == manifest.map { case (k, v) => k -> v })
  }

  test("chunking covers every token with the configured overlap") {
    import spark.implicits._
    val size = 32; val overlap = 8; val step = size - overlap
    val chunks = Pipeline.chunkDocuments(spark, sf, size, overlap).collect()
      .groupBy(_.getLong(0))
    val tokens = Tables.documents(spark, sf)
      .select($"doc_id", org.apache.spark.sql.functions.size(
        TextAnalysis.wsTokens(TextAnalysis.canonical($"text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    tokens.foreach { case (id, n) =>
      val cs = chunks(id).sortBy(_.getLong(1))
      val expected = math.max(1L, (n - overlap + step - 1) / step)
      assert(cs.length == expected, s"doc $id: ${cs.length} chunks for $n tokens")
      // chunk ids dense from 0; all full-size except possibly the last
      assert(cs.map(_.getLong(1)).sameElements(0L until expected))
      cs.init.foreach(c => assert(c.getLong(2) == size))
      assert(cs.last.getLong(2) == n - (expected - 1) * step || n <= size)
    }
  }

  test("partitioned write produces lang=* directories and round-trips") {
    val out = java.nio.file.Files.createTempDirectory("curated").toString
    val stats = Pipeline.curateAndWrite(spark, sf, out).collect()
    assert(stats.nonEmpty)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.forall(_.startsWith("lang=")), s"unexpected layout: ${dirs.toSeq}")
    assert(dirs.length == stats.length)
    // partition pruning: reading one language touches only its directory
    val one = stats.head.getString(0)
    val pruned = spark.read.parquet(out).filter(org.apache.spark.sql.functions.col("lang") === one)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == stats.head.getLong(1))
  }

  test("chunk boilerplate: per-doc invariants, real signal, no pinned cache") {
    import spark.implicits._
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val rows = Pipeline.chunkBoilerplate(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs, "every document must be reported")
    rows.foreach { r =>
      val (nChunks, nBoiler, frac) = (r.getLong(1), r.getLong(2), r.getDouble(4))
      assert(nBoiler >= 0 && nBoiler <= nChunks)
      assert(frac == nBoiler.toDouble / nChunks)
    }
    // the fixture plants near-duplicates, so the interesting path (shared
    // chunks within a source) must actually fire, not vacuously pass
    assert(rows.exists(_.getLong(2) > 0), "no boilerplate detected at all")
    assert(rows.exists(r => r.getLong(2) < r.getLong(1)),
      "every chunk flagged boilerplate — detector is degenerate")
    // independent recount of one flagged doc: its boiler chunks really do
    // appear in >= 2 distinct docs of the same source
    val flagged = rows.filter(_.getLong(2) > 0).map(_.getLong(0)).toSet
    val chunks = Pipeline.chunkDocuments(spark, sf, 8, 0)
      .join(Tables.documents(spark, sf).select($"doc_id", $"source"), "doc_id")
    val shared = chunks.groupBy($"source", $"chunk_key")
      .agg(org.apache.spark.sql.functions.countDistinct($"doc_id").as("nd"))
      .filter($"nd" >= 2)
      .join(chunks, Seq("source", "chunk_key"))
      .select($"doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(flagged == shared, s"flagged-doc set mismatch: ${flagged.diff(shared)} / ${shared.diff(flagged)}")
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- pinnedBefore
    assert(leaked.isEmpty, s"chunkBoilerplate left pinned RDD ids: $leaked")
  }

  test("upsert replaces matched rows, inserts unmatched, passes the rest") {
    import spark.implicits._
    val base = Tables.documents(spark, sf).select($"doc_id", $"source", $"text")
    val edits = base.filter($"doc_id" % 7 === 0)
      .select($"doc_id", $"source", upper($"text").as("text"))
    val inserts = base.filter($"doc_id" % 11 === 0)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"source", $"text")
    val merged = Pipeline.upsert(base, edits.unionByName(inserts), "doc_id").cache()
    try {
      // cardinality: edits replace, inserts add
      assert(merged.count() == base.count() + inserts.count())
      // keys unique after the merge
      assert(merged.select($"doc_id").distinct().count() == merged.count())
      // a matched row carries the UPDATE's payload, not the base's
      val updated = merged.filter($"doc_id" % 7 === 0 && $"doc_id" < 1000000L)
        .select($"text").as[String].collect()
      assert(updated.nonEmpty && updated.forall(t => t == t.toUpperCase),
        "matched rows kept the base payload")
      // an untouched row is bit-identical to the base
      val keep = base.filter($"doc_id" % 7 =!= 0).orderBy($"doc_id").collect()
      val got = merged.filter($"doc_id" % 7 =!= 0 && $"doc_id" < 1000000L)
        .orderBy($"doc_id").collect()
      assert(keep.sameElements(got))
    } finally { merged.unpersist(); () }
  }

  test("length batches: buckets are bit-lengths, batches <= size, padding recounts") {
    import spark.implicits._
    val rows = Pipeline.lengthBatches(spark, sf).collect()
    // driver-side replay: bucket docs, rank ascending, batch by 8
    val docs = Tables.documents(spark, sf)
      .select($"doc_id",
        size(TextAnalysis.wsTokens(TextAnalysis.canonical($"text"))).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byBucket = docs.groupBy { case (_, n) => 64 - java.lang.Long.numberOfLeadingZeros(math.max(n, 1L)) }
    assert(rows.map(_.getLong(1)).sum == docs.length, "manifest loses documents")
    rows.foreach { r =>
      val (bucket, nDocs, nBatches) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val exp = byBucket(bucket.toInt).map(_._2).sorted
      assert(nDocs == exp.length.toLong)
      assert(nBatches == (exp.length + 7) / 8, s"bucket $bucket batch count")
      assert(r.getLong(3) == exp.sum, s"bucket $bucket token total")
      val pad = exp.grouped(8).map(g => g.max * g.length - g.sum).sum
      assert(r.getLong(4) == pad, s"bucket $bucket padding")
      // padding within a power-of-two bucket is bounded by (docs per
      // bucket) x (bucket width) — the reason for length bucketing
      assert(r.getLong(4) <= nDocs * (1L << bucket.toInt), s"bucket $bucket pad bound")
    }
  }

  test("token budget selects the greedy maximal quality prefix") {
    import spark.implicits._
    // sf0.01: ~27k corpus tokens, so the 10k budget actually binds
    val sf = "/root/testdata/sf0.01"
    val got = Pipeline.tokenBudget(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // driver replay: quality desc, doc_id asc, inclusive cumsum, cut at budget
    val q = TextAnalysis.qualityScore(spark, sf).select($"doc_id", $"quality")
      .join(TextAnalysis.textStats(spark, sf).select($"doc_id", $"n_tokens_ws"), "doc_id")
      .select($"doc_id", $"n_tokens_ws", $"quality")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy { case (id, _, qual) => (-qual, id) }
    var cum = 0L
    val exp = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var excluded = false
    q.foreach { case (id, n, _) =>
      cum += n
      if (cum <= 10000L) exp += ((id, n, cum)) else excluded = true
    }
    assert(got.sortBy(_._1).toSeq == exp.sortBy(_._1).toSeq)
    // the budget actually binds on this corpus (otherwise the test is vacuous)
    assert(excluded, "budget did not bind — raise corpus size or lower budget")
  }

  test("DSIR weights separate target-like from raw documents") {
    import spark.implicits._
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val w = Pipeline.dsirWeights(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    val nDocs = Tables.documents(spark, sf).count()
    assert(w.size == nDocs, "every document must be weighted")
    w.values.foreach { case (n, lw, sel) =>
      assert(n > 0)
      assert(sel == (lw > 0L), "selected flag must equal sign of the weight")
    }
    // importance weights must point TOWARD the target distribution: the
    // mean per-token log-weight of target docs exceeds that of the rest
    val target = TextAnalysis.qualityScore(spark, sf)
      .filter($"quality" >= 0.5).select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(target.nonEmpty && target.size < w.size, "degenerate quality split")
    def meanPerTok(ids: Iterable[Long]) = {
      val xs = ids.map(w); xs.map(_._2.toDouble).sum / xs.map(_._1).sum
    }
    val (inT, outT) = (meanPerTok(target), meanPerTok(w.keySet -- target))
    assert(inT > outT,
      s"target docs not upweighted: mean/token $inT vs $outT micro-nats")
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- pinnedBefore
    assert(leaked.isEmpty, s"dsirWeights left pinned RDD ids: $leaked")
  }

  test("snapshot diff: a driver recount of every key's verdict agrees") {
    val rows = Pipeline.snapshotDiff(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val exp = scala.collection.mutable.Map[(String, String), (Long, Long)]()
    docs.foreach { case (id, lang) =>
      val (inOld, inNew) = (id % 5 != 4, id % 5 != 0)
      val status =
        if (inOld && inNew) { if (id % 7 == 3) "changed" else "unchanged" }
        else if (inNew) "added"
        else if (inOld) "removed"
        else null
      if (status != null) {
        val (n, s) = exp.getOrElse((status, lang), (0L, 0L))
        exp((status, lang)) = (n + 1L, s + id)
      }
    }
    assert(rows == exp.toMap, s"diff rollup mismatch:\n got $rows\nwant $exp")
    // all four verdicts must actually occur on the derived snapshots
    assert(rows.keys.map(_._1).toSet == Set("added", "removed", "changed", "unchanged"))
  }

  test("compaction plan: bins cover the manifest within the sorted-fill bound") {
    import spark.implicits._
    val bins = Pipeline.compactionPlan(spark, sf).collect()
    val files = Tables.documents(spark, sf)
      .groupBy(pmod($"doc_id", lit(199)).as("f")).agg(sum($"n_chars").as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = files.values.sum
    val target = math.max(total / 8, 1L)
    assert(bins.map(_.getAs[Long]("n_files")).sum == files.size.toLong,
      "every file must land in exactly one bin")
    assert(bins.map(_.getAs[Long]("bin_bytes")).sum == total,
      "bin bytes must conserve the manifest total")
    val maxFile = files.values.max
    bins.foreach { r =>
      assert(r.getAs[Long]("bin_bytes") <= target + maxFile,
        s"bin ${r.getAs[Long]("bin")} exceeds the sorted-fill bound")
    }
  }
}
