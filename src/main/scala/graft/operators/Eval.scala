package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Classifier-evaluation operators — the metrics a training pipeline
  * computes over billions of scored rows before trusting a filter model:
  * exact ROC-AUC (Mann–Whitney rank statistic), score calibration, and
  * Cohen's kappa. All three run over the SAME deterministic scorer as
  * `nd_lang_id` (TextAnalysis.langProfiles), so the eval rows and the
  * classifier they grade cannot silently diverge.
  *
  * Exactness discipline: every metric is integer micro-units end-to-end.
  * AUC in particular is usually computed with floating ranks; here it is
  * the exact tie-aware rank-sum — distinct scores are aggregated first
  * (the frame shrinks from |corpus| to |distinct micro scores|, ≤1e6+1
  * rows per source by construction), the cumulative rank window runs per
  * PARTITION (source) over that aggregated frame, and products widen to
  * DECIMAL(38,0) BEFORE multiplying (the oracle widens to HUGEINT at the
  * same step — the round-6 advice discipline).
  *
  * Scale shape: one corpus scan → one (source, score) hash aggregate →
  * a window over the already-aggregated per-source frame → one per-source
  * roll-up. No global sort, no single-partition window; nothing
  * row-scale moves after the first aggregate.
  */
object Eval {

  /** Per-doc integer score: English-profile gram hits per million chars
    * (the `nd_lang_id` 'en' scorer, micro-normalized by doc length so the
    * score is length-invariant). Exact: gram hits are integer counts and
    * the ratio is DECIMAL-widened truncating division (`div`, matching
    * the oracle's `//` on non-negative operands). */
  private[graft] def scoredDocs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val padded = concat(lit(" "), lower($"text"), lit(" "))
    documents(s, d)
      .select(
        $"source",
        ($"lang" === "en").cast("long").as("pos"),
        TextAnalysis.profileScore(padded, TextAnalysis.langProfiles("en"))
          .cast("long").as("hits"),
        length($"text").cast("long").as("n_chars"),
        $"doc_id")
      .select($"source", $"pos",
        expr("CAST(1000000 * CAST(hits AS DECIMAL(38,0)) div greatest(n_chars, 1) AS BIGINT)")
          .as("score"),
        $"doc_id")
  }

  /** The DuckDB spelling of [[scoredDocs]]'s score (expects a padded
    * column `p` and the raw `text` in scope). */
  private[operators] def enScoreMicroSql: String = {
    val hits = TextAnalysis.profileScoreSql(TextAnalysis.langProfiles("en"))
    s"""CAST(1000000 * CAST(($hits) AS HUGEINT) // greatest(length(text), 1) AS BIGINT)"""
  }

  /** Exact tie-aware ROC-AUC per source: does the 'en' scorer rank
    * labeled-English documents above the rest? AUC = (2·Σranks(pos) −
    * P(P+1)) / (2·P·N) with average ranks for ties, computed WITHOUT a
    * row-scale rank window: aggregate to (source, score) → (count c,
    * positives p), cumulative count per source over that aggregated
    * frame, and each score level contributes p·(2·cum_before + c + 1) to
    * twice the positive rank-sum (its c tied rows share average rank
    * cum_before + (c+1)/2). Sources missing a class emit NULL (AUC is
    * undefined there), never a divide-by-zero. */
  def aucBySource(s: SparkSession, d: String): DataFrame =
    aucOf(scoredDocs(s, d))

  /** The rank-sum AUC over any `(source, pos, score)` frame — factored
    * out so specs can feed planted separations (perfect → 1e6,
    * inverted → 0, all-tied → 500000). */
  private[graft] def aucOf(scored: DataFrame): DataFrame = {
    val s = scored.sparkSession
    import s.implicits._
    val byScore = scored
      .groupBy($"source", $"score")
      .agg(count(lit(1)).as("c"), sum($"pos").as("p"))
    val w = Window.partitionBy($"source").orderBy($"score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = byScore
      .withColumn("cum_before", sum($"c").over(w) - $"c")
    withCum
      .groupBy($"source")
      .agg(
        sum(expr("CAST(p AS DECIMAL(38,0)) * (2 * cum_before + c + 1)"))
          .as("r2"),
        sum($"p").as("n_pos"),
        sum($"c" - $"p").as("n_neg"),
        sum($"c").as("n_docs"))
      .select(
        $"source", $"n_docs", $"n_pos", $"n_neg",
        when($"n_pos" > 0 && $"n_neg" > 0,
          expr("""CAST((r2 - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1)) * 1000000
                  div (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)"""))
          .as("auc_micro"))
      .orderBy($"source")
  }

  /** Exact tie-aware precision-recall AUC (average precision) per source —
    * the metric that matters when positives are rare (a quality filter at
    * corpus scale keeps 1-in-100 docs; ROC-AUC stays rosy there, AP does
    * not). Ties are handled blockwise: distinct score levels are
    * aggregated first (same frame shrink as [[aucOf]]), blocks are walked
    * in DESCENDING score order, and each block of c rows / p positives
    * contributes p · precision_at_block_end. Integer micro-units
    * end-to-end with the div discipline: precision_micro = 1e6·TP div N
    * per block (truncating, identically on both engines), then the
    * p-weighted sum divides by n_pos. Sources with no positives emit NULL.
    * Scale shape: identical to [[aucOf]] — one hash aggregate, a window
    * over the aggregated per-source frame, one roll-up. */
  def prAucBySource(s: SparkSession, d: String): DataFrame =
    prAucOf(scoredDocs(s, d))

  /** Blockwise average precision over any `(source, pos, score)` frame. */
  private[graft] def prAucOf(scored: DataFrame): DataFrame = {
    val s = scored.sparkSession
    import s.implicits._
    val byScore = scored
      .groupBy($"source", $"score")
      .agg(count(lit(1)).as("c"), sum($"pos").as("p"))
    val w = Window.partitionBy($"source").orderBy($"score".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = byScore
      .withColumn("tp", sum($"p").over(w))
      .withColumn("n_at", sum($"c").over(w))
    withCum
      .groupBy($"source")
      .agg(
        sum(expr("CAST(p AS DECIMAL(38,0)) * (1000000 * CAST(tp AS DECIMAL(38,0)) div n_at)"))
          .as("ap_num"),
        sum($"p").as("n_pos"),
        sum($"c" - $"p").as("n_neg"),
        sum($"c").as("n_docs"))
      .select(
        $"source", $"n_docs", $"n_pos", $"n_neg",
        expr("CAST(1000000 * CAST(n_pos AS DECIMAL(38,0)) div n_docs AS BIGINT)")
          .as("prevalence_micro"),
        when($"n_pos" > 0,
          expr("CAST(ap_num div n_pos AS BIGINT)"))
          .as("pr_auc_micro"))
      .orderBy($"source")
  }

  /** Score calibration table: fixed-width micro-score buckets (div 1e4 —
    * deterministic percentile-width edges, never a quantile estimate) → bucket
    * size, positive count, exact positive-rate and mean score in micro
    * units. The reliability-diagram input at corpus scale: one hash
    * aggregate; the bucket count is bounded by the score range, not the
    * corpus. */
  def calibration(s: SparkSession, d: String): DataFrame =
    calibrationOf(scoredDocs(s, d))

  private[graft] def calibrationOf(scored: DataFrame): DataFrame = {
    val s = scored.sparkSession
    import s.implicits._
    scored
      .groupBy(expr("score div 10000").as("bucket"))
      .agg(count(lit(1)).as("n"), sum($"pos").as("n_pos"),
        sum($"score".cast("decimal(38,0)")).as("score_sum"))
      .select($"bucket", $"n", $"n_pos",
        expr("CAST(1000000 * CAST(n_pos AS DECIMAL(38,0)) div n AS BIGINT)")
          .as("pos_rate_micro"),
        expr("CAST(score_sum div n AS BIGINT)").as("mean_score_micro"))
      .orderBy($"bucket")
  }

  /** Cumulative Poisson(1) CDF in integer micro units — the shared
    * constant ladder both engines use to turn a hash-uniform micro draw
    * into a deterministic bootstrap weight (P(X≤k) for k = 0..8; u at or
    * beyond the last threshold caps at weight 9). */
  private val PoissonMicroCdf = Seq(
    367879L, 735758L, 919698L, 981011L, 996340L,
    999405L, 999916L, 999989L, 999998L)

  /** Deterministic Poisson-bootstrap confidence interval for the mean
    * quality score per source — the uncertainty a pipeline needs before
    * trusting a metric shift at corpus scale. The classical bootstrap
    * resamples n-of-n WITH replacement, which cannot be computed in one
    * pass over distributed data; the Poisson bootstrap (the standard
    * massive-data substitute: each row enters replicate b with
    * multiplicity ~ Poisson(1)) needs only a per-row weight — and here
    * that weight is DETERMINISTIC: u = md5-fold("boot"|doc_id|b) mod 1e6
    * inverted through the shared integer [[PoissonMicroCdf]] ladder, so
    * both engines, any layout, any run produce bit-identical replicates
    * (the q36 md5-fold discipline applied to resampling).
    *
    * Scale shape: one scan → a bounded B=40× map-side explode → one
    * (source, replicate) hash aggregate (≤ |sources|·B groups) → order
    * statistics over the 40 replicate means per source via a bounded
    * window. Nothing row-scale moves after the first aggregate; B is a
    * constant, not data. lo/hi are the 2nd/39th order statistics of 40
    * replicate means (≈ the 2.5th/97.5th percentiles), ties broken by
    * replicate id — exact integer micro end-to-end. */
  def bootstrapCi(s: SparkSession, d: String, reps: Int = 40): DataFrame = {
    import s.implicits._
    val scored = scoredDocs(s, d)
    val point = scored.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        expr("CAST(sum(CAST(score AS DECIMAL(38,0))) div count(*) AS BIGINT)")
          .as("point_micro"))
    val u = conv(substring(md5(concat_ws("|", lit("boot"), $"doc_id", $"b")), 1, 7), 16, 10)
      .cast("long") % 1000000L
    var w: Column = lit(PoissonMicroCdf.length.toLong)
    for ((t, k) <- PoissonMicroCdf.zipWithIndex.reverse)
      w = when($"u" < t, k.toLong).otherwise(w)
    val repMeans = scored
      .select($"source", $"score", $"doc_id",
        explode(sequence(lit(0), lit(reps - 1))).as("b"))
      .withColumn("u", u)
      .withColumn("w", w)
      .groupBy($"source", $"b")
      .agg(expr("""CAST(sum(CAST(w AS DECIMAL(38,0)) * score)
                   div greatest(sum(w), 1) AS BIGINT)""").as("mean_micro"))
    val byMean = Window.partitionBy($"source").orderBy($"mean_micro", $"b")
    val ci = repMeans
      .withColumn("rn", row_number().over(byMean))
      .groupBy($"source")
      .agg(min(when($"rn" === 2, $"mean_micro")).as("lo_micro"),
           min(when($"rn" === reps - 1, $"mean_micro")).as("hi_micro"))
    point.join(ci, "source")
      .select($"source", $"n_docs", $"point_micro", $"lo_micro", $"hi_micro",
              lit(reps.toLong).as("n_replicates"))
      .orderBy($"source")
  }

  /** Cohen's kappa over the full multi-class langId confusion matrix —
    * chance-corrected agreement between labeled and predicted language:
    * kappa = (n·Σdiag − Σ row_l·col_l) / (n² − Σ row_l·col_l). Runs the
    * SAME per-doc prediction as nd_lang_id, aggregates once to the
    * ≤|langs|² confusion frame (bounded metadata — the marginal joins
    * after it are broadcast-scale by construction), and emits the exact
    * micro kappa with sign-safe division: `div` truncates toward zero
    * while DuckDB's `//` floors, and they disagree on negatives — kappa
    * IS negative for worse-than-chance agreement (which decorative
    * labels can produce) — so the magnitude divides and the sign
    * multiplies back, identically on both engines. */
  def kappa(s: SparkSession, d: String): DataFrame =
    kappaOf(TextAnalysis.langId(s, d))

  /** Kappa over any `(labeled_lang, predicted_lang)` frame. */
  private[graft] def kappaOf(pred: DataFrame): DataFrame = {
    val s = pred.sparkSession
    import s.implicits._
    val cm = pred
      .groupBy($"labeled_lang", $"predicted_lang")
      .agg(count(lit(1)).as("n"))
    val rowTot = cm.groupBy($"labeled_lang".as("l"))
      .agg(sum($"n").as("row_n"))
    val colTot = cm.groupBy($"predicted_lang".as("l"))
      .agg(sum($"n").as("col_n"))
    val peNum = rowTot.join(colTot, Seq("l"))
      .agg(coalesce(sum(expr("CAST(row_n AS DECIMAL(38,0)) * col_n")),
        lit(0).cast("decimal(38,0)")).as("pe_num"))
    cm.agg(
        sum($"n").as("n_docs"),
        sum(when($"labeled_lang" === $"predicted_lang", $"n").otherwise(0L))
          .as("n_agree"))
      .crossJoin(peNum)
      .withColumn("num",
        expr("CAST(n_docs AS DECIMAL(38,0)) * n_agree - pe_num"))
      .withColumn("den",
        expr("CAST(n_docs AS DECIMAL(38,0)) * n_docs - pe_num"))
      .select(
        $"n_docs", $"n_agree",
        expr("CAST(1000000 * CAST(n_agree AS DECIMAL(38,0)) div n_docs AS BIGINT)")
          .as("po_micro"),
        expr("CAST(pe_num * 1000000 div (CAST(n_docs AS DECIMAL(38,0)) * n_docs) AS BIGINT)")
          .as("pe_micro"),
        when($"den" > 0,
          expr("""CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END)
                  * (abs(num) * 1000000 div den) AS BIGINT)"""))
          .as("kappa_micro"))
  }

  /** Per-class precision / recall / F1 over the langId prediction — the
    * classification report that pairs with [[kappa]]'s single-number
    * agreement. Exact integer micro-units throughout: with per-class
    * tp / support (row total) / predicted_n (column total),
    * `F1 = 2·tp / (support + predicted_n)` — the denominators are the
    * marginals themselves, so no float precision/recall intermediate
    * ever exists and the harmonic mean is ONE integer division.
    * Undefined cells (a class never predicted / never labeled) are NULL,
    * not 0 — the sklearn zero-division footgun made explicit.
    *
    * 100 TB: the per-doc prediction is the same map-side scoring scan as
    * nd_lang_id; everything after is the ≤|langs|² confusion frame —
    * bounded metadata, broadcast-scale joins. */
  def f1ByClass(s: SparkSession, d: String): DataFrame =
    f1Of(TextAnalysis.langId(s, d))

  /** Classification report over any `(labeled_lang, predicted_lang)` frame. */
  private[graft] def f1Of(pred: DataFrame): DataFrame = {
    val s = pred.sparkSession
    import s.implicits._
    val cm = pred
      .groupBy($"labeled_lang", $"predicted_lang")
      .agg(count(lit(1)).as("n"))
    val byLabel = cm.groupBy($"labeled_lang".as("class"))
      .agg(sum($"n").as("support"),
           sum(when($"labeled_lang" === $"predicted_lang", $"n").otherwise(0L))
             .as("tp_l"))
    val byPred = cm.groupBy($"predicted_lang".as("class"))
      .agg(sum($"n").as("predicted_n"))
    byLabel.join(byPred, Seq("class"), "full_outer")
      .select($"class",
        coalesce($"support", lit(0L)).as("support"),
        coalesce($"predicted_n", lit(0L)).as("predicted_n"),
        coalesce($"tp_l", lit(0L)).as("tp"))
      .select($"class", $"support", $"predicted_n", $"tp",
        when($"predicted_n" > 0,
          expr("CAST(1000000 * CAST(tp AS DECIMAL(38,0)) div predicted_n AS BIGINT)"))
          .as("precision_micro"),
        when($"support" > 0,
          expr("CAST(1000000 * CAST(tp AS DECIMAL(38,0)) div support AS BIGINT)"))
          .as("recall_micro"),
        when($"support" + $"predicted_n" > 0,
          expr("CAST(2000000 * CAST(tp AS DECIMAL(38,0)) div (support + predicted_n) AS BIGINT)"))
          .as("f1_micro"))
      .orderBy($"class")
  }

  /** Population-Stability-Index DRIFT MONITOR — the distribution-shift
    * gate an ML-ops pipeline runs between a baseline corpus snapshot and
    * the current one before retraining on it: per categorical dimension
    * (`lang`, `source`) and bucket, the PSI contribution
    * `(p − q)·ln(p/q)` with add-one (Laplace) smoothing so a bucket
    * present in only one snapshot contributes a finite, deterministic
    * term instead of ±∞. Snapshots split on the ingest key
    * (`doc_id < n/2` — ids are assigned in arrival order, so the halves
    * ARE earlier-vs-later corpus states).
    *
    * Exactness: p/q are exact integer micro-fractions
    * (`(cnt+1)·1e6 div (n+V)`); the single float op is the tfidf-style
    * micro-nat quantization `round(ln(·)·1e6)` whose argument is one
    * division of two exactly-representable DECIMAL-widened integer
    * products — identical op order in both engines. Contributions are
    * then exact integer products in pico units (micro × micro-nats).
    *
    * Scale shape: one data-decoding corpus scan exploding each row into
    * its bounded dimension set, ONE partial-agg'd (dim, bucket) hash
    * aggregate; per-dim totals and bucket cardinality derive from that
    * bounded frame and broadcast back onto it. Nothing data-scale moves
    * after the aggregate. The snapshot-split midpoint is a separate
    * driver count action first — on parquet that is a count-star with an
    * empty read schema (row-group metadata, no column pages), so the
    * corpus's data pages are decoded once, not twice. */
  def driftPsi(s: SparkSession, d: String): DataFrame =
    psiOf(snapshotCounts(s, d))

  /** The halved-ingest `(dim, bucket, b_cnt, c_cnt)` snapshot count frame
    * every CATEGORICAL drift monitor shares — [[driftPsi]] and
    * [[driftChi2]] are pure bounded-frame arithmetic over this one
    * corpus aggregate, so adding a statistic never adds a corpus scan. */
  private[graft] def snapshotCounts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d).select($"doc_id", $"lang", $"source")
    val half = docs.count() / 2
    docs.select($"doc_id", explode(psiDims($"lang", $"source")).as("e"))
      .groupBy($"e.dim".as("dim"), $"e.bucket".as("bucket"))
      .agg(sum(when($"doc_id" < half, 1L).otherwise(0L)).as("b_cnt"),
           sum(when($"doc_id" >= half, 1L).otherwise(0L)).as("c_cnt"))
  }

  /** The per-row (dim, bucket) struct array both the batch and the
    * drained-stream PSI monitors explode — one definition so the two
    * paths cannot diverge. */
  private[graft] def psiDims(lang: Column, source: Column): Column = array(
    struct(lit("lang").as("dim"), lang.as("bucket")),
    struct(lit("source").as("dim"), source.as("bucket")))

  /** The PSI arithmetic over any `(dim, bucket, b_cnt, c_cnt)` count
    * frame — shared by [[driftPsi]] and the drained-stream twin
    * (`nd_stream_drift`), whose only stateful stage produces exactly
    * this frame. Totals and bucket cardinality derive from the bounded
    * frame itself (no second corpus pass). */
  private[graft] def psiOf(counts: DataFrame): DataFrame = {
    val s = counts.sparkSession
    import s.implicits._
    val tot = counts.groupBy($"dim")
      .agg(sum($"b_cnt").as("nb"), sum($"c_cnt").as("nc"),
           count(lit(1)).as("v"))
    counts.join(broadcast(tot), "dim")
      .withColumn("p_micro", expr("((b_cnt + 1) * 1000000) div (nb + v)"))
      .withColumn("q_micro", expr("((c_cnt + 1) * 1000000) div (nc + v)"))
      .withColumn("ln_micro",
        round(log(
          (($"b_cnt" + 1).cast("decimal(38,0)") * ($"nc" + $"v")).cast("double") /
          (($"c_cnt" + 1).cast("decimal(38,0)") * ($"nb" + $"v")).cast("double")
        ) * 1000000).cast("long"))
      .select($"dim", $"bucket", $"b_cnt", $"c_cnt", $"p_micro", $"q_micro",
              (($"p_micro" - $"q_micro") * $"ln_micro").as("psi_pico"))
      .orderBy($"dim", $"bucket")
  }

  /** Pearson χ² TWO-SAMPLE homogeneity test over the same categorical
    * snapshot frame as [[driftPsi]] — the classical-significance
    * complement to PSI's heuristic thresholds, covering the categorical
    * case PSI only approximates. Emitted per bucket as the N-normalized
    * MEAN-SQUARE CONTINGENCY φ² = χ²/N contribution (raw χ² grows
    * linearly with corpus size, so a fixed alert threshold on it is
    * meaningless at varying N; φ² ∈ [0,1] is the scale-free quantity a
    * monitor actually thresholds, and Cramér's V for a 2×K table is
    * simply √φ²). Algebra: with D_i = b_i·nc − c_i·nb, the 2×K χ²
    * collapses to Σ D_i²/(nb·nc·t_i), hence
    * φ²_i = (b_i/nb − c_i/nc)² · (nb/N)(nc/N) / (t_i/N).
    *
    * Exactness: NO floats at all (PSI needs one ln; χ² is pure
    * rational) — each factor is an integer micro-fraction with
    * DECIMAL(38,0)/HUGEINT-widened numerators, combined in a fixed
    * documented op order; every factor is ≤ 1e6, so no intermediate
    * exceeds 1e18 at ANY corpus size. An empty snapshot (nb or nc = 0)
    * yields NULL statistics, never a divide-by-zero — the KS discipline.
    *
    * QUANTIZATION FLOOR (documented limit, round-10 advice): the
    * per-bucket frequency denominator t_i/N is a micro-fraction clamped
    * at 1 micro, so a bucket rarer than one in 10⁶ (t_i/N < 1e-6) has
    * its denominator read as exactly 1e-6 and its φ² contribution
    * UNDERSTATED — ultra-rare-category drift below that share is
    * invisible to this statistic. The floor is deliberate: micro units
    * keep the worst-case quotient (≤ 1e12·1e6) inside BIGINT, where a
    * pico denominator would overflow it at pathological shares; monitor
    * ultra-rare categories with [[driftPsi]]'s per-bucket counts (b_cnt/
    * c_cnt are emitted raw here too, so a zero-vs-nonzero rare-bucket
    * alarm needs no division at all).
    *
    * Scale shape: identical to [[driftPsi]] — the one-scan bounded
    * [[snapshotCounts]] aggregate, a per-dim totals broadcast back onto
    * it, then row-local arithmetic. */
  def driftChi2(s: SparkSession, d: String): DataFrame =
    chi2Of(snapshotCounts(s, d))

  /** The χ²/φ² arithmetic over any `(dim, bucket, b_cnt, c_cnt)` count
    * frame — kept separate from the scan (like [[psiOf]]) so a streaming
    * twin can reuse it on a stateful count frame verbatim. */
  private[graft] def chi2Of(counts: DataFrame): DataFrame = {
    val s = counts.sparkSession
    import s.implicits._
    val tot = counts.groupBy($"dim")
      .agg(sum($"b_cnt").as("nb"), sum($"c_cnt").as("nc"))
    val empty = $"nb" === 0L || $"nc" === 0L
    counts.join(broadcast(tot), "dim")
      .withColumn("dp_micro",
        when(empty, lit(null).cast("long")).otherwise(expr(
          "CAST((CAST(b_cnt AS DECIMAL(38,0)) * 1000000) div nb" +
          " - (CAST(c_cnt AS DECIMAL(38,0)) * 1000000) div nc AS BIGINT)")))
      .withColumn("phi2_pico",
        when(empty, lit(null).cast("long")).otherwise(expr(
          """CAST((((CAST(dp_micro AS DECIMAL(38,0)) * dp_micro
                     * ((CAST(nb AS DECIMAL(38,0)) * 1000000) div (nb + nc))) div 1000000
                     * ((CAST(nc AS DECIMAL(38,0)) * 1000000) div (nb + nc))) div 1000000)
                   * 1000000 div greatest((CAST(b_cnt + c_cnt AS DECIMAL(38,0)) * 1000000) div (nb + nc), 1)
                 AS BIGINT)""")))
      .select($"dim", $"bucket", $"b_cnt", $"c_cnt", $"dp_micro", $"phi2_pico")
      .orderBy($"dim", $"bucket")
  }

  /** McNEMAR paired-classifier test — the statistically-correct way to
    * compare two classifiers evaluated on the SAME documents (a bare
    * accuracy delta ignores that the errors are paired): over the docs
    * both the n-gram heuristic ([[TextAnalysis.langId]]) and the naive-
    * Bayes model ([[TextAnalysis.nbClassify]]) scored (the NB test
    * half), count the concordant/discordant cells and report McNemar's
    * χ² = (b−c)²/(b+c) over the discordant pair — pure rational, so the
    * statistic is one exact DECIMAL-widened integral division in micro
    * units (NULL when no discordant pairs exist: the test is undefined,
    * not zero).
    *
    * Scale shape: both classifier pipelines keep their own audited
    * shapes; the pairing is one doc-keyed equi-join and a single
    * partial-agg'd scalar aggregate — nothing new moves at data scale.
    * The heuristic side scores ONLY the NB test half (the join would
    * discard the train half anyway), pushing the pairing filter below
    * the 30-regexp scoring pass — the round-10 verdict's shared-scan
    * finding. */
  def mcnemar(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val a = TextAnalysis.langIdOn(
        documents(s, d).filter(pmod($"doc_id", lit(2)) === 1))
      .select($"doc_id", ($"predicted_lang" === $"labeled_lang").as("ca"))
    val b = TextAnalysis.nbClassify(s, d)
      .select($"doc_id", $"correct".as("cb"))
    a.join(b, "doc_id")
      .agg(count(lit(1)).as("n"),
           sum(when($"ca" && $"cb", 1L).otherwise(0L)).as("both_correct"),
           sum(when($"ca" && !$"cb", 1L).otherwise(0L)).as("only_heuristic"),
           sum(when(!$"ca" && $"cb", 1L).otherwise(0L)).as("only_nb"),
           sum(when(!$"ca" && !$"cb", 1L).otherwise(0L)).as("both_wrong"))
      .select($"n", $"both_correct", $"only_heuristic", $"only_nb", $"both_wrong",
        when($"only_heuristic" + $"only_nb" === 0L, lit(null).cast("long"))
          .otherwise(expr(
            "CAST(CAST(only_heuristic - only_nb AS DECIMAL(38,0))" +
            " * (only_heuristic - only_nb) * 1000000" +
            " div (only_heuristic + only_nb) AS BIGINT)"))
          .as("mcnemar_micro"))
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic over a NUMERIC column
    * (`n_chars`) between the same ingest-key snapshots as [[driftPsi]] —
    * the numeric complement to PSI's categorical buckets: the maximum
    * ECDF gap, its location, and the two sample sizes, all exact.
    *
    * Exactness: the ECDF gap at value v is |cb(v)·nc − cc(v)·nb| over
    * the common denominator nb·nc — DECIMAL(38,0)-widened integer
    * products compared exactly (no float ever), the argmax tying to the
    * smallest value; `ks_micro` is one integral division at the end.
    *
    * Scale shape: one data-decoding corpus scan (plus the same
    * empty-schema split-count action as [[driftPsi]]) → one partial-agg'd
    * per-value count aggregate (the frame shrinks to |distinct values| —
    * the AUC discipline); both cumulative counts run through
    * [[graft.plans.ScalableNtile.runningTotal]] (range-partitioned
    * two-phase cumsum — no single-partition window even if the value
    * domain grows); one bounded-frame argmax aggregate ends it. */
  def driftKs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d).select($"doc_id", $"n_chars")
    val half = docs.count() / 2
    // the per-value count frame feeds the boundary sample, both cumsums
    // AND the totals — persist it so the corpus aggregates once (the
    // tfidf discipline)
    val cts = graft.plans.Caching.iterCheckpoint(docs.groupBy($"n_chars".as("v"))
      .agg(sum(when($"doc_id" < half, 1L).otherwise(0L)).as("b"),
           sum(when($"doc_id" >= half, 1L).otherwise(0L)).as("c")))
    val cum = graft.plans.ScalableNtile.runningTotals(
      cts, Seq($"b" -> "cb", $"c" -> "cc"), Seq($"v"))
    val tot = cts.agg(sum($"b").as("nb"), sum($"c").as("nc"))
    val out = cum.crossJoin(broadcast(tot))
      .withColumn("diff",
        abs($"cb".cast("decimal(38,0)") * $"nc" - $"cc".cast("decimal(38,0)") * $"nb"))
      .agg(max(struct($"diff", (-$"v").as("nv"))).as("m"),
           max($"nb").as("nb"), max($"nc").as("nc"))
      .select(
        // an empty snapshot makes KS undefined — surface a NULL statistic
        // (never an ANSI divide-by-zero) so degenerate corpora pass through
        when($"nb" === 0L || $"nc" === 0L, lit(null).cast("long"))
          .otherwise(expr(
            "CAST((m.diff * 1000000) div (CAST(nb AS DECIMAL(38,0)) * nc) AS BIGINT)"))
          .as("ks_micro"),
        (-$"m.nv").as("at_value"), $"nb", $"nc")
    graft.plans.Caching.detach(out, () => graft.plans.Caching.freeCheckpoint(cts))
  }

  /** REGRESSION EVAL — the numeric-prediction complement to the
    * classification metrics (F1/AUC/kappa grade label models; nothing
    * graded a VALUE model): train a per-event-type mean-value predictor
    * on the even-id half in exact micro-cents (`Σcents·10⁶ div n` — the
    * same integral-division discipline as BM25/NB), score the odd-id
    * half, and report per type the exact error moments — MAE, the raw
    * signed error sum (kept UNDIVIDED: signed integral division is a
    * classic cross-engine hazard class, and the raw sum is the more
    * composable statistic — consumers divide at whatever precision they
    * want; for the record, Spark `div`, Scala `Long./` and DuckDB `//`
    * all truncate toward zero, measured in [[Events.holtForecast]]'s
    * round-trip), and the squared-error sum widened to DECIMAL(38,0)
    * BEFORE squaring (err_micro² ≈ 4·10¹⁸ per row already brushes
    * BIGINT).
    *
    * Scale shape: the model is |event types|-sized and broadcast back
    * onto the test scan (one aggregate each way, no window, no sort);
    * nothing row-scale moves after the per-type partial aggregates. */
  def regressionEval(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = events(s, d).select($"event_id", $"event_type",
      expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
    val model = e.filter(pmod($"event_id", lit(2)) === 0)
      .groupBy($"event_type")
      .agg(expr("CAST(CAST(sum(cents) AS DECIMAL(38,0)) * 1000000 div count(1) AS BIGINT)")
        .as("pred_micro"))
    e.filter(pmod($"event_id", lit(2)) === 1)
      .join(broadcast(model), "event_type")
      .withColumn("err", $"cents" * 1000000L - $"pred_micro")
      .groupBy($"event_type", $"pred_micro")
      .agg(count(lit(1)).as("n_test"),
           // sums widened to DECIMAL(38,0) BEFORE accumulating: per-row
           // |err| ≈ 2e9 micro-cents × a 600M-event heavy type brushes
           // 2^63, and non-ANSI BIGINT sum wraps silently while the
           // DuckDB oracle sums in HUGEINT
           expr("CAST(sum(CAST(abs(err) AS DECIMAL(38,0))) div count(1) AS BIGINT)")
             .as("mae_micro"),
           expr("CAST(sum(CAST(err AS DECIMAL(38,0))) AS BIGINT)")
             .as("err_sum_micro"),
           // sse_micro2 exceeds 2^63 (≈2.4e22 at sf0.01) — pinned as
           // STRING on both engines so no reader downcasts it to float64
           // (the eth_q12_wei_decimal representation discipline)
           expr("CAST(CAST(sum(CAST(err AS DECIMAL(38,0)) * err) AS DECIMAL(38,0)) AS STRING)")
             .as("sse_micro2"))
      .orderBy($"event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nd_eval_regression" -> (regressionEval _),
    "nd_drift_psi" -> (driftPsi _),
    "nd_drift_chi2" -> (driftChi2 _),
    "nd_drift_ks" -> (driftKs _),
    "nd_eval_mcnemar" -> (mcnemar _),
    "nd_eval_f1" -> (f1ByClass _),
    "nd_eval_auc" -> (aucBySource _),
    "nd_eval_pr_auc" -> (prAucBySource _),
    "nd_eval_bootstrap_ci" -> ((s: SparkSession, d: String) => bootstrapCi(s, d)),
    "nd_eval_calibration" -> (calibration _),
    "nd_eval_kappa" -> (kappa _))

  /** The DuckDB spelling of the md5-fold micro-uniform draw (q36 fold,
    * 7 hex chars) and the Poisson ladder, shared by the bootstrap oracle. */
  private def bootstrapOracleSql(reps: Int = 40): String = {
    val ladder = PoissonMicroCdf.zipWithIndex
      .map { case (t, k) => s"WHEN u < $t THEN $k" }.mkString(" ")
    s"""WITH scored AS (
          SELECT doc_id, source, $enScoreMicroSql AS score
          FROM (SELECT doc_id, source, lang, text,
                       ' ' || lower(text) || ' ' AS p FROM documents)),
        pt AS (SELECT source, count(*) AS n_docs,
                      CAST(sum(CAST(score AS HUGEINT)) // count(*) AS BIGINT)
                        AS point_micro
               FROM scored GROUP BY source),
        drawn AS (
          SELECT source, score, b,
                 CASE $ladder ELSE ${PoissonMicroCdf.length} END AS w
          FROM (
            SELECT source, score, b,
                   CAST(list_sum(list_transform(range(1,8), fi ->
                     (strpos('0123456789abcdef',
                       substr(md5(concat_ws('|', 'boot', doc_id, b)), fi, 1)) - 1)::BIGINT
                     << (4*(7-fi)))) AS BIGINT) % 1000000 AS u
            FROM scored CROSS JOIN (SELECT unnest(range(0, $reps)) AS b))),
        reps AS (
          SELECT source, b,
                 CAST(sum(CAST(w AS HUGEINT) * score)
                      // greatest(sum(w), 1) AS BIGINT) AS mean_micro
          FROM drawn GROUP BY source, b),
        ranked AS (
          SELECT source, mean_micro,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY mean_micro, b) AS rn
          FROM reps)
        SELECT p.source, p.n_docs, p.point_micro,
               min(CASE WHEN rn = 2 THEN mean_micro END) AS lo_micro,
               min(CASE WHEN rn = ${reps - 1} THEN mean_micro END) AS hi_micro,
               CAST($reps AS BIGINT) AS n_replicates
        FROM pt p JOIN ranked r USING (source)
        GROUP BY p.source, p.n_docs, p.point_micro
        ORDER BY p.source"""
  }

  val oracle: Map[String, String] = Map(
    // regression-eval replay: same half split, same micro-cent integral
    // divisions, HUGEINT-widened squared errors (mirrors DECIMAL(38,0))
    "nd_eval_regression" ->
      """WITH e AS (SELECT event_id, event_type,
                           CAST(round("value" * 100) AS BIGINT) AS cents
                    FROM events),
         m AS (SELECT event_type,
                      CAST((CAST(sum(cents) AS HUGEINT) * 1000000) // count(*) AS BIGINT)
                        AS pred_micro
               FROM e WHERE event_id % 2 = 0 GROUP BY event_type),
         t AS (SELECT e.event_type, m.pred_micro,
                      e.cents * 1000000 - m.pred_micro AS err
               FROM e JOIN m USING (event_type)
               WHERE event_id % 2 = 1)
         SELECT event_type, pred_micro,
                CAST(count(*) AS BIGINT) AS n_test,
                CAST(sum(CAST(abs(err) AS HUGEINT)) // count(*) AS BIGINT) AS mae_micro,
                CAST(sum(CAST(err AS HUGEINT)) AS BIGINT) AS err_sum_micro,
                CAST(CAST(sum(CAST(err AS HUGEINT) * err) AS DECIMAL(38,0)) AS VARCHAR)
                  AS sse_micro2
         FROM t GROUP BY event_type, pred_micro ORDER BY event_type""",
    // KS replay: per-value counts, window cumsums (the literal spelling
    // of the range-decomposed runningTotal), HUGEINT cross products,
    // smallest-value argmax, one integral division
    "nd_drift_ks" ->
      """WITH dd AS (SELECT doc_id, n_chars FROM documents),
          nn AS (SELECT count(*) // 2 AS half FROM dd),
          cts AS (SELECT n_chars AS v,
                    CAST(sum(CASE WHEN doc_id < half THEN 1 ELSE 0 END) AS BIGINT) AS b,
                    CAST(sum(CASE WHEN doc_id >= half THEN 1 ELSE 0 END) AS BIGINT) AS c
                  FROM dd CROSS JOIN nn GROUP BY 1),
          tot AS (SELECT CAST(sum(b) AS BIGINT) AS nb, CAST(sum(c) AS BIGINT) AS nc FROM cts),
          cum AS (SELECT v, sum(b) OVER (ORDER BY v) AS cb,
                         sum(c) OVER (ORDER BY v) AS cc FROM cts),
          dfs AS (SELECT v, abs(CAST(cb AS HUGEINT) * nc - CAST(cc AS HUGEINT) * nb) AS diff
                  FROM cum CROSS JOIN tot)
          SELECT CAST(((SELECT max(diff) FROM dfs) * 1000000)
                      // (CAST(nb AS HUGEINT) * nc) AS BIGINT) AS ks_micro,
                 (SELECT min(v) FROM dfs
                  WHERE diff = (SELECT max(diff) FROM dfs)) AS at_value,
                 nb, nc
          FROM tot""",
    // McNemar replay: composes the two classifier oracles verbatim as
    // CTEs (DuckDB allows nested WITH), pairs on doc_id, then the exact
    // HUGEINT-widened discordant-cell statistic in the Spark op order
    "nd_eval_mcnemar" ->
      s"""WITH ha AS (${TextAnalysis.oracle("nd_lang_id")}),
          nbc AS (${TextAnalysis.oracle("nd_text_nb_classifier")}),
          p AS (SELECT ha.doc_id,
                       ha.predicted_lang = ha.labeled_lang AS ca,
                       nbc.correct AS cb
                FROM ha JOIN nbc ON ha.doc_id = nbc.doc_id),
          g AS (SELECT CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(CASE WHEN ca AND cb THEN 1 ELSE 0 END) AS BIGINT) AS both_correct,
                       CAST(sum(CASE WHEN ca AND NOT cb THEN 1 ELSE 0 END) AS BIGINT) AS only_heuristic,
                       CAST(sum(CASE WHEN NOT ca AND cb THEN 1 ELSE 0 END) AS BIGINT) AS only_nb,
                       CAST(sum(CASE WHEN NOT ca AND NOT cb THEN 1 ELSE 0 END) AS BIGINT) AS both_wrong
                FROM p)
          SELECT n, both_correct, only_heuristic, only_nb, both_wrong,
                 CASE WHEN only_heuristic + only_nb = 0 THEN NULL
                      ELSE CAST(CAST(only_heuristic - only_nb AS HUGEINT)
                                * (only_heuristic - only_nb) * 1000000
                                // (only_heuristic + only_nb) AS BIGINT)
                 END AS mcnemar_micro
          FROM g""",
    // chi-square replay: same snapshot counts as PSI, pure integer
    // rational arithmetic (no floats), HUGEINT-widened micro fractions in
    // the identical op order; empty snapshot => NULL (never a div0)
    "nd_drift_chi2" ->
      """WITH dd AS (SELECT doc_id, lang, source FROM documents),
          nn AS (SELECT count(*) // 2 AS half FROM dd),
          dv AS (SELECT doc_id, 'lang' AS dim, lang AS bucket FROM dd
                 UNION ALL
                 SELECT doc_id, 'source', source FROM dd),
          cts AS (SELECT dim, bucket,
                    CAST(sum(CASE WHEN doc_id < half THEN 1 ELSE 0 END) AS BIGINT) AS b_cnt,
                    CAST(sum(CASE WHEN doc_id >= half THEN 1 ELSE 0 END) AS BIGINT) AS c_cnt
                  FROM dv CROSS JOIN nn GROUP BY 1, 2),
          tt AS (SELECT dim, CAST(sum(b_cnt) AS BIGINT) AS nb,
                        CAST(sum(c_cnt) AS BIGINT) AS nc
                 FROM cts GROUP BY 1),
          j AS (SELECT dim, bucket, b_cnt, c_cnt, nb, nc,
                  CASE WHEN nb = 0 OR nc = 0 THEN NULL
                       ELSE CAST((CAST(b_cnt AS HUGEINT) * 1000000) // nb
                               - (CAST(c_cnt AS HUGEINT) * 1000000) // nc AS BIGINT)
                  END AS dp_micro
                FROM cts JOIN tt USING (dim))
          SELECT dim, bucket, b_cnt, c_cnt, dp_micro,
                 CASE WHEN nb = 0 OR nc = 0 THEN NULL
                      ELSE CAST((((CAST(dp_micro AS HUGEINT) * dp_micro
                             * ((CAST(nb AS HUGEINT) * 1000000) // (nb + nc))) // 1000000
                             * ((CAST(nc AS HUGEINT) * 1000000) // (nb + nc))) // 1000000)
                           * 1000000 // greatest((CAST(b_cnt + c_cnt AS HUGEINT) * 1000000) // (nb + nc), 1)
                           AS BIGINT)
                 END AS phi2_pico
          FROM j ORDER BY dim, bucket""",
    // PSI replay: same halved-ingest split, add-one smoothing, integer
    // micro fractions, HUGEINT-widened products under the one ln()
    "nd_drift_psi" ->
      """WITH dd AS (SELECT doc_id, lang, source FROM documents),
          nn AS (SELECT count(*) // 2 AS half FROM dd),
          dv AS (SELECT doc_id, 'lang' AS dim, lang AS bucket FROM dd
                 UNION ALL
                 SELECT doc_id, 'source', source FROM dd),
          cts AS (SELECT dim, bucket,
                    CAST(sum(CASE WHEN doc_id < half THEN 1 ELSE 0 END) AS BIGINT) AS b_cnt,
                    CAST(sum(CASE WHEN doc_id >= half THEN 1 ELSE 0 END) AS BIGINT) AS c_cnt
                  FROM dv CROSS JOIN nn GROUP BY 1, 2),
          tt AS (SELECT dim, CAST(sum(b_cnt) AS BIGINT) AS nb,
                        CAST(sum(c_cnt) AS BIGINT) AS nc,
                        CAST(count(*) AS BIGINT) AS v
                 FROM cts GROUP BY 1)
          SELECT dim, bucket, b_cnt, c_cnt,
                 ((b_cnt + 1) * 1000000) // (nb + v) AS p_micro,
                 ((c_cnt + 1) * 1000000) // (nc + v) AS q_micro,
                 (((b_cnt + 1) * 1000000) // (nb + v)
                  - ((c_cnt + 1) * 1000000) // (nc + v))
                 * CAST(round(ln(CAST(CAST(b_cnt + 1 AS HUGEINT) * (nc + v) AS DOUBLE)
                               / CAST(CAST(c_cnt + 1 AS HUGEINT) * (nb + v) AS DOUBLE))
                              * 1000000) AS BIGINT) AS psi_pico
          FROM cts JOIN tt USING (dim)
          ORDER BY dim, bucket""",
    "nd_eval_auc" ->
      s"""WITH scored AS (
            SELECT source,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
                   $enScoreMicroSql AS score
            FROM (SELECT source, lang, text,
                         ' ' || lower(text) || ' ' AS p FROM documents)),
          g AS (SELECT source, score, count(*) AS c, sum(pos) AS p
                FROM scored GROUP BY source, score),
          w AS (SELECT source, score, c, p,
                       sum(c) OVER (PARTITION BY source ORDER BY score
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         - c AS cum_before
                FROM g),
          a AS (SELECT source,
                       sum(CAST(p AS HUGEINT) * (2 * cum_before + c + 1)) AS r2,
                       sum(p) AS n_pos, sum(c - p) AS n_neg, sum(c) AS n_docs
                FROM w GROUP BY source)
          SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
                 CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
                 CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                   CAST((r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1)) * 1000000
                        // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT)
                 END AS auc_micro
          FROM a ORDER BY source""",
    "nd_eval_pr_auc" ->
      s"""WITH scored AS (
            SELECT source,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
                   $enScoreMicroSql AS score
            FROM (SELECT source, lang, text,
                         ' ' || lower(text) || ' ' AS p FROM documents)),
          g AS (SELECT source, score, count(*) AS c, sum(pos) AS p
                FROM scored GROUP BY source, score),
          w AS (SELECT source, c, p,
                       sum(p) OVER (PARTITION BY source ORDER BY score DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
                       sum(c) OVER (PARTITION BY source ORDER BY score DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_at
                FROM g),
          a AS (SELECT source,
                       sum(CAST(p AS HUGEINT)
                           * (1000000 * CAST(tp AS HUGEINT) // n_at)) AS ap_num,
                       sum(p) AS n_pos, sum(c - p) AS n_neg, sum(c) AS n_docs
                FROM w GROUP BY source)
          SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
                 CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
                 CAST(1000000 * CAST(n_pos AS HUGEINT) // n_docs AS BIGINT)
                   AS prevalence_micro,
                 CASE WHEN n_pos > 0 THEN CAST(ap_num // n_pos AS BIGINT)
                 END AS pr_auc_micro
          FROM a ORDER BY source""",
    "nd_eval_bootstrap_ci" -> bootstrapOracleSql(),
    "nd_eval_calibration" ->
      s"""WITH scored AS (
            SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
                   $enScoreMicroSql AS score
            FROM (SELECT lang, text, ' ' || lower(text) || ' ' AS p
                  FROM documents))
          SELECT score // 10000 AS bucket,
                 count(*) AS n, CAST(sum(pos) AS BIGINT) AS n_pos,
                 CAST(1000000 * CAST(sum(pos) AS HUGEINT) // count(*) AS BIGINT)
                   AS pos_rate_micro,
                 CAST(CAST(sum(score) AS HUGEINT) // count(*) AS BIGINT)
                   AS mean_score_micro
          FROM scored GROUP BY bucket ORDER BY bucket""",
    "nd_eval_f1" ->
      s"""WITH pred AS (${TextAnalysis.langIdOracleSql.replace("ORDER BY doc_id", "")}),
          cm AS (SELECT labeled_lang, predicted_lang, count(*) AS n
                 FROM pred GROUP BY labeled_lang, predicted_lang),
          bl AS (SELECT labeled_lang AS class, sum(n) AS support,
                        sum(CASE WHEN labeled_lang = predicted_lang
                            THEN n ELSE 0 END) AS tp
                 FROM cm GROUP BY 1),
          bp AS (SELECT predicted_lang AS class, sum(n) AS predicted_n
                 FROM cm GROUP BY 1),
          j AS (SELECT coalesce(bl.class, bp.class) AS class,
                       coalesce(support, 0) AS support,
                       coalesce(predicted_n, 0) AS predicted_n,
                       coalesce(tp, 0) AS tp
                FROM bl FULL OUTER JOIN bp ON bl.class = bp.class)
          SELECT class, CAST(support AS BIGINT) AS support,
                 CAST(predicted_n AS BIGINT) AS predicted_n,
                 CAST(tp AS BIGINT) AS tp,
                 CASE WHEN predicted_n > 0 THEN
                   CAST(1000000 * CAST(tp AS HUGEINT) // predicted_n AS BIGINT)
                 END AS precision_micro,
                 CASE WHEN support > 0 THEN
                   CAST(1000000 * CAST(tp AS HUGEINT) // support AS BIGINT)
                 END AS recall_micro,
                 CASE WHEN support + predicted_n > 0 THEN
                   CAST(2000000 * CAST(tp AS HUGEINT)
                        // (support + predicted_n) AS BIGINT)
                 END AS f1_micro
          FROM j ORDER BY class""",
    "nd_eval_kappa" ->
      s"""WITH pred AS (${TextAnalysis.langIdOracleSql.replace("ORDER BY doc_id", "")}),
          cm AS (SELECT labeled_lang, predicted_lang, count(*) AS n
                 FROM pred GROUP BY labeled_lang, predicted_lang),
          rt AS (SELECT labeled_lang AS l, sum(n) AS row_n FROM cm GROUP BY 1),
          ct AS (SELECT predicted_lang AS l, sum(n) AS col_n FROM cm GROUP BY 1),
          pe AS (SELECT coalesce(sum(CAST(row_n AS HUGEINT) * col_n), 0) AS pe_num
                 FROM rt JOIN ct USING (l)),
          a AS (SELECT CAST(sum(n) AS HUGEINT) AS n_docs,
                       CAST(sum(CASE WHEN labeled_lang = predicted_lang
                                     THEN n ELSE 0 END) AS HUGEINT) AS n_agree
                FROM cm)
          SELECT CAST(n_docs AS BIGINT) AS n_docs,
                 CAST(n_agree AS BIGINT) AS n_agree,
                 CAST(1000000 * n_agree // n_docs AS BIGINT) AS po_micro,
                 CAST(pe_num * 1000000 // (n_docs * n_docs) AS BIGINT) AS pe_micro,
                 CASE WHEN n_docs * n_docs - pe_num > 0 THEN
                   CAST((CASE WHEN n_docs * n_agree - pe_num < 0 THEN -1 ELSE 1 END)
                        * (abs(n_docs * n_agree - pe_num) * 1000000
                           // (n_docs * n_docs - pe_num)) AS BIGINT)
                 END AS kappa_micro
          FROM a, pe""")
}
