package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Eval

/** Value gates for the classifier-eval family: the oracle proves the SQL
  * agrees; these prove the METRICS are right — AUC against a brute-force
  * pair count (the definition, not the rank-sum identity the operator
  * uses), planted separations with known closed-form AUC, kappa against
  * a driver-side replay, and conservation laws on calibration.
  */
class EvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("PSI drift monitor: planted source shift scores high, stable lang near zero") {
    import spark.implicits._
    // planted snapshots: lang mix identical across halves; source mix
    // flips from 90/10 to 10/90 — a textbook drift the monitor must flag
    val dir = java.nio.file.Files.createTempDirectory("psidrift").toString
    val rows = (0L until 400L).map { i =>
      val baseline = i < 200
      val lang = if (i % 2 == 0) "en" else "de"
      val src =
        if (baseline) { if (i % 10 < 9) "web" else "books" }
        else { if (i % 10 < 9) "books" else "web" }
      (i, s"doc $i", lang, src, 6L)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val psi = Eval.driftPsi(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(6)).toMap
    val sourcePsi = psi(("source", "web")) + psi(("source", "books"))
    val langPsi = psi(("lang", "en")) + psi(("lang", "de"))
    // pico units: PSI ≥ 0.25 is the standard "significant shift" bar
    assert(sourcePsi > 250L * 1000000000L,
      s"planted 90/10→10/90 source flip must exceed PSI 0.25, got $sourcePsi pico")
    assert(langPsi.abs < 1L * 1000000000L,
      s"stable lang mix must stay near zero, got $langPsi pico")
    // driver replay of one contribution (web: 180+1 of 200+2 vs 20+1 of
    // 200+2) pins the exact arithmetic
    val p = (181L * 1000000L) / 202L
    val q = (21L * 1000000L) / 202L
    val ln = math.round(math.log((181.0 * 202.0) / (21.0 * 202.0)) * 1000000.0)
    assert(psi(("source", "web")) == (p - q) * ln)
  }

  test("chi-square drift: planted flip matches closed-form phi2, stable dim is zero") {
    import spark.implicits._
    // same planted corpus shape as the PSI test: source flips 90/10 →
    // 10/90 (true 2×2 χ² = 256 on N=400, so φ² = 0.64 split evenly
    // across the two buckets), lang mix identical across halves (φ² = 0)
    val dir = java.nio.file.Files.createTempDirectory("chidrift").toString
    (0L until 400L).map { i =>
      val baseline = i < 200
      val lang = if (i % 2 == 0) "en" else "de"
      val src =
        if (baseline) { if (i % 10 < 9) "web" else "books" }
        else { if (i % 10 < 9) "books" else "web" }
      (i, s"doc $i", lang, src, 6L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val chi = Eval.driftChi2(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(5)).toMap
    // closed form per bucket: dp = 0.9−0.1 = 0.8, fb = fc = 0.5,
    // tf = 0.5 → 0.64·0.5·0.5/0.5 = 0.32 = 320e9 pico; both source
    // buckets contribute it, so Σ = φ² = 0.64 ⇒ χ² = N·φ² = 256 exactly
    assert(chi(("source", "web")) == 320000000000L)
    assert(chi(("source", "books")) == 320000000000L)
    assert(chi(("lang", "en")) == 0L && chi(("lang", "de")) == 0L)
  }

  test("mcnemar matches a driver replay of the paired classifier outcomes") {
    val ha = graft.operators.TextAnalysis.langId(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(2) == r.getString(1))).toMap
    val nb = graft.operators.TextAnalysis.nbClassify(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val paired = nb.keys.toSeq.filter(ha.contains).map(k => (ha(k), nb(k)))
    val b = paired.count { case (a, c) => a && !c }.toLong
    val c = paired.count { case (a, cc) => !a && cc }.toLong
    val row = Eval.mcnemar(spark, sf).head
    assert(row.getAs[Long]("n") == paired.size.toLong)
    assert(row.getAs[Long]("only_heuristic") == b)
    assert(row.getAs[Long]("only_nb") == c)
    val expected =
      if (b + c == 0) None
      else Some((BigInt(b - c) * (b - c) * 1000000 / (b + c)).toLong)
    assert((if (row.isNullAt(5)) None else Some(row.getLong(5))) == expected)
  }

  test("KS drift: disjoint supports score 1.0; real corpus matches driver replay") {
    import spark.implicits._
    // planted: baseline lengths 100..109, current 200..209 — disjoint
    // supports, so the max ECDF gap is exactly 1.0 at the last baseline
    // value
    val dir = java.nio.file.Files.createTempDirectory("ksdrift").toString
    (0L until 400L).map { i =>
      val nc = if (i < 200) 100L + i % 10 else 200L + i % 10
      (i, "x", "en", "s0", nc)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = Eval.driftKs(spark, dir).head
    assert(planted.getAs[Long]("ks_micro") == 1000000L)
    assert(planted.getAs[Long]("at_value") == 109L)
    // driver replay on the real corpus
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val half = docs.length / 2
    val (b, c) = docs.partition(_._1 < half)
    val vs = docs.map(_._2).distinct.sorted
    val (nb, nc2) = (b.length.toLong, c.length.toLong)
    val gaps = vs.map { v =>
      (BigInt(b.count(_._2 <= v)) * nc2 - BigInt(c.count(_._2 <= v)) * nb).abs -> v
    }
    val maxGap = gaps.map(_._1).max
    val atV = gaps.filter(_._1 == maxGap).map(_._2).min
    val got = Eval.driftKs(spark, sf).head
    assert(got.getAs[Long]("ks_micro") == (maxGap * 1000000 / (BigInt(nb) * nc2)).toLong)
    assert(got.getAs[Long]("at_value") == atV)
    assert(got.getAs[Long]("nb") == nb && got.getAs[Long]("nc") == nc2)
  }

  test("rank-sum AUC equals the brute-force pair count on the real corpus") {
    val scored = Eval.scoredDocs(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = Eval.aucBySource(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    val expected = scored.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (src, rows) =>
        val pos = rows.filter(_._2 == 1L).map(_._3)
        val neg = rows.filter(_._2 == 0L).map(_._3)
        val auc =
          if (pos.isEmpty || neg.isEmpty) None
          else {
            // brute Mann–Whitney: concordant + half-ties over all pairs
            var conc2 = BigInt(0) // 2*concordant + ties
            for (p <- pos; n <- neg) {
              if (p > n) conc2 += 2 else if (p == n) conc2 += 1
            }
            Some((conc2 * 1000000 /
              (BigInt(2) * pos.length * neg.length)).toLong)
          }
        (src, rows.length.toLong, pos.length.toLong, neg.length.toLong, auc)
    }
    assert(got == expected,
      s"auc mismatch: got=${got.take(2)} exp=${expected.take(2)}")
  }

  test("planted separations hit the closed-form AUC") {
    import spark.implicits._
    // perfect separation / inverted / all-tied, two groups in one frame
    val rows = Seq(
      ("sep", 1L, 100L), ("sep", 1L, 90L), ("sep", 0L, 10L), ("sep", 0L, 5L),
      ("inv", 1L, 1L), ("inv", 0L, 50L), ("inv", 0L, 60L),
      ("tie", 1L, 7L), ("tie", 1L, 7L), ("tie", 0L, 7L),
      ("onecls", 1L, 3L), ("onecls", 1L, 4L))
    val got = Eval.aucOf(rows.toDF("source", "pos", "score")).collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(got("sep") == 1000000L)
    assert(got("inv") == 0L)
    assert(got("tie") == 500000L)
    assert(got("onecls") == -1L, "single-class source must emit NULL")
  }

  test("blockwise PR-AUC equals a driver-side replay of the definition") {
    val scored = Eval.scoredDocs(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = Eval.prAucBySource(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSeq
    val expected = scored.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (src, rows) =>
        val nPos = rows.count(_._2 == 1L)
        val nDocs = rows.length
        // blockwise AP replay: distinct scores desc, per-block truncating
        // micro precision, p-weighted, then divided by n_pos
        val blocks = rows.groupBy(_._3).toSeq.sortBy(-_._1)
          .map { case (_, b) => (b.length, b.count(_._2 == 1L)) }
        var (tp, nAt, apNum) = (BigInt(0), BigInt(0), BigInt(0))
        blocks.foreach { case (c, p) =>
          tp += p; nAt += c
          apNum += BigInt(p) * (BigInt(1000000) * tp / nAt)
        }
        val ap = if (nPos == 0) None else Some((apNum / nPos).toLong)
        (src, nDocs.toLong, nPos.toLong, (nDocs - nPos).toLong,
          (BigInt(1000000) * nPos / nDocs).toLong, ap)
    }
    assert(got == expected,
      s"pr_auc mismatch: got=${got.take(2)} exp=${expected.take(2)}")
  }

  test("planted PR-AUC cases: perfect, inverted, tied, no-positive") {
    import spark.implicits._
    val rows = Seq(
      ("sep", 1L, 100L), ("sep", 1L, 90L), ("sep", 0L, 10L), ("sep", 0L, 5L),
      ("inv", 1L, 1L), ("inv", 0L, 50L), ("inv", 0L, 60L),
      ("tie", 1L, 7L), ("tie", 1L, 7L), ("tie", 0L, 7L),
      ("nopos", 0L, 3L), ("nopos", 0L, 4L))
    val got = Eval.prAucOf(rows.toDF("source", "pos", "score")).collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(5)) -1L else r.getLong(5))).toMap
    assert(got("sep") == 1000000L, s"perfect separation: ${got("sep")}")
    // lone positive ranked last of 3: precision there = 1/3
    assert(got("inv") == 333333L, s"inverted: ${got("inv")}")
    // single tied block, 2 of 3 positive: AP = precision = 2/3
    assert(got("tie") == 666666L, s"all-tied: ${got("tie")}")
    assert(got("nopos") == -1L, "no-positive source must emit NULL")
  }

  test("Poisson-bootstrap CI equals a driver-side replay; interval is sane") {
    import java.security.MessageDigest
    val cdf = Seq(367879L, 735758L, 919698L, 981011L, 996340L,
      999405L, 999916L, 999989L, 999998L)
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def weight(docId: Long, b: Int): Long = {
      val u = java.lang.Long.parseLong(md5hex(s"boot|$docId|$b").take(7), 16) % 1000000L
      cdf.indexWhere(u < _) match { case -1 => cdf.length.toLong; case k => k.toLong }
    }
    val scored = Eval.scoredDocs(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3))) // (source, score, doc_id)
    val reps = 40
    val expected = scored.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, rows) =>
      val point = (rows.map(r => BigInt(r._2)).sum / rows.length).toLong
      val means = (0 until reps).map { b =>
        val ws = rows.map { case (_, score, id) => (weight(id, b), score) }
        val sw = ws.map(_._1).sum
        ((ws.map { case (w, sc) => BigInt(w) * sc }.sum) / BigInt(sw.max(1L)), b)
      }.sortBy(identity).map(_._1.toLong)
      (src, rows.length.toLong, point, means(1), means(reps - 2), reps.toLong)
    }
    val got = Eval.bootstrapCi(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected,
      s"bootstrap mismatch:\n got=${got.take(2)}\n exp=${expected.take(2)}")
    got.foreach { case (src, _, point, lo, hi, _) =>
      assert(lo <= hi, s"$src: lo > hi")
      // a 95% CI from 40 replicates should bracket the point estimate on
      // this corpus (sources have dozens-to-hundreds of docs)
      assert(lo <= point && point <= hi, s"$src: point $point outside [$lo, $hi]")
    }
  }

  test("kappa matches a driver-side replay and po/pe are consistent") {
    val preds = graft.operators.TextAnalysis.langId(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val n = BigInt(preds.length)
    val agree = BigInt(preds.count { case (a, b) => a == b })
    val rowT = preds.groupBy(_._1).view.mapValues(v => BigInt(v.length)).toMap
    val colT = preds.groupBy(_._2).view.mapValues(v => BigInt(v.length)).toMap
    val pe = rowT.keySet.intersect(colT.keySet).toSeq
      .map(l => rowT(l) * colT(l)).sum
    val num = n * agree - pe
    val den = n * n - pe
    val expKappa = (if (num < 0) -1 else 1) * (num.abs * 1000000 / den)
    val r = Eval.kappa(spark, sf).collect().head
    assert(r.getLong(0) == n.toLong && r.getLong(1) == agree.toLong)
    assert(r.getLong(2) == (agree * 1000000 / n).toLong, "po mismatch")
    assert(r.getLong(3) == (pe * 1000000 / (n * n)).toLong, "pe mismatch")
    assert(r.getLong(4) == expKappa.toLong, "kappa mismatch")
  }

  test("negative kappa divides sign-safely (planted worse-than-chance)") {
    import spark.implicits._
    // two classes, predictions exactly inverted: kappa = -1
    val pred = Seq(("a", "b"), ("a", "b"), ("b", "a"), ("b", "a"))
      .toDF("labeled_lang", "predicted_lang")
    val r = Eval.kappaOf(pred).collect().head
    assert(r.getLong(4) == -1000000L,
      s"inverted predictions must give kappa=-1, got ${r.getLong(4)}")
  }

  test("per-class F1 report: planted confusion incl. undefined cells") {
    import spark.implicits._
    // labels a,a,a,b,b,c → preds a,a,b,b,b,d: class c never predicted,
    // class d never labeled — the two zero-division cells
    val pred = Seq(("a", "a"), ("a", "a"), ("a", "b"),
                   ("b", "b"), ("b", "b"), ("c", "d"))
      .toDF("labeled_lang", "predicted_lang")
    val got = Eval.f1Of(pred).collect().map(r => (r.getString(0),
      (r.getLong(1), r.getLong(2), r.getLong(3),
       if (r.isNullAt(4)) -1L else r.getLong(4),
       if (r.isNullAt(5)) -1L else r.getLong(5),
       if (r.isNullAt(6)) -1L else r.getLong(6)))).toMap
    // a: support 3, predicted 2, tp 2 → P=1, R=2/3, F1=2·2/(3+2)=4/5
    assert(got("a") == ((3L, 2L, 2L, 1000000L, 666666L, 800000L)), got("a"))
    // b: support 2, predicted 3, tp 2 → P=2/3, R=1, F1=4/5
    assert(got("b") == ((2L, 3L, 2L, 666666L, 1000000L, 800000L)), got("b"))
    // c: never predicted → precision NULL (not 0); recall 0; F1 0
    assert(got("c") == ((1L, 0L, 0L, -1L, 0L, 0L)), got("c"))
    // d: never labeled → recall NULL; precision 0; F1 0
    assert(got("d") == ((0L, 1L, 0L, 0L, -1L, 0L)), got("d"))
  }

  test("F1 report marginals are consistent with the kappa frame") {
    val f1 = Eval.f1ByClass(spark, sf).collect()
    val k = Eval.kappa(spark, sf).collect().head
    assert(f1.map(_.getLong(1)).sum == k.getLong(0),
      "per-class supports must sum to n_docs")
    assert(f1.map(_.getLong(2)).sum == k.getLong(0),
      "per-class predicted counts must sum to n_docs")
    assert(f1.map(_.getLong(3)).sum == k.getLong(1),
      "per-class tp must sum to n_agree")
  }

  test("calibration conserves mass and stays in range") {
    val docs = Tables.documents(spark, sf).count()
    val en = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("lang") === "en").count()
    val rows = Eval.calibration(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == docs, "bucket sizes must sum to corpus")
    assert(rows.map(_.getLong(2)).sum == en, "positives must sum to en docs")
    rows.foreach { r =>
      val (bucket, n, np, rate, mean) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(np <= n && rate >= 0 && rate <= 1000000L)
      // bucket edges: every mean score lies inside its bucket
      assert(mean >= bucket * 10000 && mean < (bucket + 1) * 10000)
    }
  }

  test("regression eval matches a driver replay of the mean predictor") {
    val sf = "/root/testdata/sf0.001"
    // sse_micro2 is STRING-pinned (the r12 representation fix: its values
    // exceed 2^63, and a DECIMAL output tripped the driver comparator's
    // reader asymmetry) — parse the digits back to BigInt for the replay
    val rows = Eval.regressionEval(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
         BigInt(r.getString(5)))).toMap
    val evs = Tables.events(spark, sf)
      .selectExpr("event_id", "event_type",
        "CAST(round(value * 100, 0) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val types = evs.map(_._2).distinct
    types.foreach { t =>
      val train = evs.filter(e => e._2 == t && e._1 % 2 == 0).map(_._3)
      val test = evs.filter(e => e._2 == t && e._1 % 2 == 1).map(_._3)
      val pred = BigInt(train.sum) * 1000000 / train.size
      val errs = test.map(c => BigInt(c) * 1000000 - pred)
      val (p, n, mae, esum, sse) = rows(t)
      assert(p == pred.toLong, s"$t: predictor")
      assert(n == test.size.toLong, s"$t: test count")
      assert(mae == (errs.map(_.abs).sum / errs.size).toLong, s"$t: MAE")
      assert(esum == errs.sum.toLong, s"$t: signed error sum")
      assert(sse == errs.map(e => e * e).sum, s"$t: squared error sum")
    }
  }
}
