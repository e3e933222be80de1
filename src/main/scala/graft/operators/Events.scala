package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Event-stream BATCH analytics — the product-analytics operator family
  * (funnels, cohort retention, sessionization, calendar gap-fill) that any
  * engine claiming the reference's "analyze on-chain activity" use case
  * (cf. `/root/reference/README.md:77-196`'s per-block activity queries)
  * needs once events carry user identity. All four are classic
  * shuffle-on-user_id shapes: every window/aggregate below clusters by
  * `user_id` first, so at 100 TB each operator is ONE hash exchange of the
  * events table followed by user-local computation — no global sort, no
  * driver loop, state bounded by (users × small constant).
  *
  * Determinism discipline (the repo standard): all timestamps are floored
  * to epoch millis (`unix_millis` here, `epoch_ms` in DuckDB — identical
  * floors of the parquet nanos), all derived quantities are exact integer
  * arithmetic (`div` for averages, never float division), and every output
  * ends in a total ORDER BY.
  */
object Events {

  private val SessionGapMs = 1800000L // 30 min

  /** events projected to the integer-ms space both engines agree on. */
  private def ev(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d).select($"user_id", $"event_id", $"event_type",
      unix_millis($"ts").as("ms"))
  }

  /** Ordered conversion funnel view → click → purchase with strict
    * millisecond ordering between stages: stage k's timestamp is the MIN
    * event-ms of its type strictly after stage k-1's ms. Three chained
    * whole-partition window minima over ONE user_id exchange (Catalyst
    * plans all three `WindowExec`s over the same hash partitioning), then
    * a per-user collapse and a global roll-up.
    *
    * 100 TB: the only data-scale movement is the single user_id shuffle;
    * the per-user frame carries 4 longs; the final aggregate is
    * partial-agg'd. Avg stage delays are exact integer `div` — no float
    * summation order anywhere.
    */
  def funnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
    val perEvent = ev(s, d)
      .withColumn("v", min(when($"event_type" === "view", $"ms")).over(w))
      .withColumn("c", min(when($"event_type" === "click" && $"ms" > $"v", $"ms")).over(w))
      .withColumn("p", min(when($"event_type" === "purchase" && $"ms" > $"c", $"ms")).over(w))
    val perUser = perEvent.select($"user_id", $"v", $"c", $"p").distinct()
    perUser.agg(
      count(lit(1)).as("users_total"),
      count($"v").as("users_view"),
      count($"c").as("users_click"),
      count($"p").as("users_purchase"),
      expr("sum(c - v) div count(c)").as("avg_view_to_click_ms"),
      expr("sum(p - c) div count(p)").as("avg_click_to_purchase_ms"))
  }

  /** Weekly cohort retention: cohort = UTC epoch-week of a user's first
    * event; a user is retained at offset k if they have any event in the
    * k-th week after their first active day. Pure integer day/week math
    * (`ms div 86400000`, `div 7`) so both engines bucket identically.
    *
    * 100 TB: first-day per user is one partial-agg'd groupBy; the join
    * back to events is user_id-to-user_id (co-partitioned with the
    * aggregate's exchange); the distinct-user count per cell is
    * partial-agg'd. State is |users| rows — the minimum any retention
    * computation needs.
    */
  def retention(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val days = ev(s, d).select($"user_id", expr("ms div 86400000").as("d"))
    val first = days.groupBy($"user_id").agg(min($"d").as("d0"))
    days.join(first, "user_id")
      .groupBy(expr("d0 div 7").as("cohort_week"),
               expr("(d - d0) div 7").as("offset_week"))
      .agg(countDistinct($"user_id").as("active_users"))
      .orderBy($"cohort_week", $"offset_week")
  }

  /** Rolling ACTIVE-USER dashboard — DAU, trailing-7-day WAU, and
    * stickiness per day, WITHOUT the windowed-distinct trap
    * (`count(DISTINCT) OVER (RANGE 6 PRECEDING)` recounts the full
    * window per row): activity collapses ONCE to DISTINCT (user, day),
    * each activity row fans out to the ≤7 report days it supports via a
    * bounded range join against the BROADCAST day list (date-scale —
    * bounded however big the corpus), and one (day) aggregate with a
    * conditional distinct reads off both measures. Stickiness is exact
    * integer micro-units with the product DECIMAL-widened. */
  def rollingActive(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val act = ev(s, d)
      .select($"user_id", expr("ms div 86400000").as("day")).distinct()
    val days = act.select($"day").distinct()
    act.as("a").join(broadcast(days.as("r")),
        col("r.day") >= col("a.day") && col("r.day") <= col("a.day") + 6)
      .groupBy(col("r.day").as("day"))
      .agg(countDistinct(when(col("a.day") === col("r.day"), $"user_id")).as("dau"),
           countDistinct($"user_id").as("wau"))
      .select($"day", $"dau", $"wau",
        expr("CAST(CAST(dau AS DECIMAL(38,0)) * 1000000 div wau AS BIGINT)")
          .as("stickiness_micro"))
      .orderBy($"day")
  }

  /** CUMULATIVE-DISTINCT user curve — per day, the exact number of
    * distinct users seen so far ("total audience to date") plus that
    * day's DAU and new-user count, WITHOUT any windowed distinct: a
    * cumulative `count(DISTINCT) OVER (ORDER BY day)` recounts an
    * ever-growing set per row and keeps unbounded distinct state in one
    * task. The scale-true decomposition is the first-seen trick —
    * a user contributes to exactly ONE day's `new_users` (their
    * `min(day)`, one partial-agg'd groupBy), so the cumulative distinct
    * count is just the running SUM of `new_users`, which
    * [[graft.plans.ScalableNtile.runningTotal]] computes without a
    * single-partition window. State is |users| rows for the first-seen
    * aggregate — the minimum any exact distinct curve needs — and the
    * running sum runs over the |days|-row daily frame.
    */
  def cumulativeDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val days = ev(s, d).select($"user_id", expr("ms div 86400000").as("day"))
    val daily = days.groupBy($"day").agg(countDistinct($"user_id").as("dau"))
    val firstSeen = days.groupBy($"user_id").agg(min($"day").as("fday"))
    val newUsers = firstSeen.groupBy($"fday".as("day"))
      .agg(count(lit(1)).as("new_users"))
    // every first-seen day has ≥1 event, so the left join from daily is
    // complete; days with no NEW users coalesce to 0
    // the day-grain frame is |days| rows but its lineage is two corpus
    // aggregates + a join, which the running total's range decomposition
    // would re-execute four times — cut the lineage at the bounded frame
    // (eager localCheckpoint: probe-measured faster than both the lazy
    // recompute and a lazy persist's columnar cache)
    val perDay = graft.plans.Caching.iterCheckpoint(
      daily.join(newUsers, Seq("day"), "left")
        .select($"day", $"dau", coalesce($"new_users", lit(0L)).as("new_users")))
    val out = graft.plans.ScalableNtile
      .runningTotal(perDay, $"new_users", Seq($"day"), "cum_users")
      .select($"day", $"dau", $"new_users", $"cum_users")
      .orderBy($"day")
    graft.plans.Caching.detach(out, () => graft.plans.Caching.freeCheckpoint(perDay))
  }

  /** Batch sessionization, 30-minute inactivity gap: the gaps-and-islands
    * decomposition (lag → break flag → running sum = session id) inside
    * each user partition, then per-session stats, then a global summary
    * row. Both windows and the session aggregate cluster by user_id, so
    * the whole operator is one exchange; the (user_id, session) groupBy
    * is satisfied by the existing user_id hash partitioning (clustered
    * distribution on a superset key) — no second shuffle.
    */
  def sessions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
    val sess = ev(s, d)
      .withColumn("brk", when(lag($"ms", 1).over(w).isNull ||
        $"ms" - lag($"ms", 1).over(w) > SessionGapMs, 1L).otherwise(0L))
      .withColumn("sid", sum($"brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sid")
      .agg(count(lit(1)).as("n_events"), (max($"ms") - min($"ms")).as("dur_ms"))
    sess.agg(
      count(lit(1)).as("n_sessions"),
      countDistinct($"user_id").as("n_users"),
      sum(when($"n_events" === 1, 1L).otherwise(0L)).as("single_event_sessions"),
      max($"n_events").as("max_session_events"),
      max($"dur_ms").as("max_session_ms"),
      sum($"dur_ms").as("total_session_ms"),
      expr("sum(n_events) div count(1)").as("avg_events_per_session"))
  }

  /** Per-user calendar gap-fill: generate the user's full active-day span
    * with `sequence` + `explode`, left-join daily event counts, zero-fill,
    * and carry the last active day's count forward (LOCF) across the
    * gaps. Reports span/active/zero days, the longest zero-run, and the
    * LOCF-filled sum — the "resample a sparse time series onto a dense
    * calendar" primitive every feature pipeline needs.
    *
    * 100 TB: the generated fan-out is bounded by span-days per user (not
    * data volume); daily counts and the span both cluster by user_id so
    * the explode happens user-locally after one exchange. The LOCF window
    * and zero-run max are user-partition windows over ≤span rows.
    */
  def gapfill(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = ev(s, d).select($"user_id", expr("ms div 86400000").as("d"))
      .groupBy($"user_id", $"d").agg(count(lit(1)).as("cnt"))
    val span = daily.groupBy($"user_id").agg(min($"d").as("d0"), max($"d").as("d1"))
    val calendar = span.select($"user_id",
      explode(sequence($"d0", $"d1")).as("d"))
    val w = Window.partitionBy($"user_id").orderBy($"d")
    val filled = calendar.join(daily, Seq("user_id", "d"), "left")
      .withColumn("filled", last($"cnt", ignoreNulls = true).over(w))
      .withColumn("active_d", when($"cnt".isNotNull, $"d"))
      // longest zero-run = max day-distance between consecutive ACTIVE days, minus 1
      .withColumn("gap", $"active_d" - lag($"active_d", 1, null).over(
        Window.partitionBy($"user_id").orderBy($"active_d")) - 1)
    filled.groupBy($"user_id")
      .agg((max($"d") - min($"d") + 1).as("span_days"),
           count($"cnt").as("active_days"),
           (count(lit(1)) - count($"cnt")).as("zero_days"),
           coalesce(max($"gap"), lit(0L)).as("max_gap_days"),
           sum($"filled").as("locf_sum"))
      .orderBy($"user_id")
  }

  /** Markov path analysis: the (from → to) transition counts of each
    * user's event sequence, with START/END pseudo-states so entry and exit
    * behavior is first-class (the "what do users do next" primitive behind
    * Sankey/path reports). One user_id exchange feeds a single window pass
    * computing BOTH `lag` (previous type, START when absent) and `lead`
    * (to detect terminal events); the two projections union map-side and
    * the transition groupBy is partial-agg'd. 100 TB: transition
    * cardinality is |types|² + 2|types| — bounded output regardless of
    * event volume; nothing data-scale sorts or collects.
    */
  def paths(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
    val base = ev(s, d)
      .withColumn("prev", lag($"event_type", 1).over(w))
      .withColumn("nxt", lead($"event_type", 1).over(w))
    val steps = base.select(
      coalesce($"prev", lit("START")).as("from_type"),
      $"event_type".as("to_type"))
    val exits = base.filter($"nxt".isNull)
      .select($"event_type".as("from_type"), lit("END").as("to_type"))
    steps.union(exits)
      .groupBy($"from_type", $"to_type").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"from_type", $"to_type")
  }

  /** First-touch vs last-touch revenue attribution: each purchase's value
    * (exact integer cents, [[Money.cents]]) is credited to the user's
    * FIRST preceding non-purchase event type and, independently, to the
    * MOST RECENT one — the two canonical attribution models, side by side
    * per channel. Purchases with no preceding touch fall into 'direct'.
    *
    * Both touch columns come from ONE window pass (first/last IGNORE NULLS
    * over the strictly-preceding frame) on the single user_id exchange;
    * the per-channel roll-ups aggregate the purchases-only slice and
    * full-outer-join on the bounded channel key. Money never leaves
    * integer cents, so Spark and the oracle agree bit-for-bit at any
    * summation order.
    */
  def attribution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = events(s, d)
      .select($"user_id", $"event_id", $"event_type",
        unix_millis($"ts").as("ms"), Money.cents($"value").as("cents"))
      .withColumn("ft", first(when($"event_type" =!= "purchase", $"event_type"),
        ignoreNulls = true).over(w))
      .withColumn("lt", last(when($"event_type" =!= "purchase", $"event_type"),
        ignoreNulls = true).over(w))
    val purchases = touch.filter($"event_type" === "purchase")
      .select(coalesce($"ft", lit("direct")).as("ft"),
              coalesce($"lt", lit("direct")).as("lt"), $"cents")
    val byFirst = purchases.groupBy($"ft".as("channel"))
      .agg(count(lit(1)).as("n_first"), sum($"cents").as("first_touch_cents"))
    val byLast = purchases.groupBy($"lt".as("channel"))
      .agg(count(lit(1)).as("n_last"), sum($"cents").as("last_touch_cents"))
    byFirst.join(byLast, Seq("channel"), "full_outer")
      .select($"channel",
        coalesce($"n_first", lit(0L)).as("n_first"),
        coalesce($"first_touch_cents", lit(0L)).as("first_touch_cents"),
        coalesce($"n_last", lit(0L)).as("n_last"),
        coalesce($"last_touch_cents", lit(0L)).as("last_touch_cents"))
      .orderBy($"channel")
  }

  /** A/B conversion chi-square, ENTIRELY in exact integer arithmetic:
    * variant = user_id mod 2, conversion = "has ≥1 purchase event"; the
    * 2×2 contingency cells a,b,c,d roll up from one per-user aggregate,
    * and the χ² statistic `N·(ad−bc)²/(r1·r2·c1·c2)` is reported in micro
    * units via DECIMAL(38,0) products and integral division — no float
    * anywhere, so both engines agree exactly (numerator ≈ 1e6·N·(ad−bc)²
    * can reach ~1e25 at sf0.1, far past long range; decimal widening is
    * load-bearing, not defensive). Zero margins yield 0, not a crash.
    *
    * EXACTNESS ENVELOPE: the 38-digit numerator bounds the exact-integer
    * formulation to |ad−bc| ≲ 4e15 — roughly 1e8 users per experiment.
    * Past it the engines leave the envelope with DIFFERENT failure modes
    * (non-ANSI Spark nulls chi2_micro; DuckDB's HUGEINT raises), so the
    * bound is a documented contract, not a silent cliff. Folding N out of
    * the intermediate would buy ~one order of magnitude but costs up to N
    * micro-units of rounding error (~100 χ² units at 1e8 users) — the
    * wrong trade for a significance statistic; an experiment beyond 1e8
    * users should subsample or accept a float χ² instead.
    *
    * 100 TB: per-user conversion is one partial-agg'd groupBy on user_id;
    * the contingency roll-up is 4 rows; everything after is literal
    * arithmetic on one row. */
  def abTest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val users = events(s, d).groupBy($"user_id")
      .agg(max(when($"event_type" === "purchase", 1L).otherwise(0L)).as("conv"))
      .withColumn("variant", pmod($"user_id", lit(2L)))
    val cells = users.agg(
      sum(when($"variant" === 0 && $"conv" === 1, 1L).otherwise(0L)).as("a"),
      sum(when($"variant" === 0 && $"conv" === 0, 1L).otherwise(0L)).as("b"),
      sum(when($"variant" === 1 && $"conv" === 1, 1L).otherwise(0L)).as("c"),
      sum(when($"variant" === 1 && $"conv" === 0, 1L).otherwise(0L)).as("d"))
    cells.select($"a", $"b", $"c", $"d",
      ($"a" + $"b" + $"c" + $"d").as("n_users"),
      expr(
        """CASE WHEN a + b = 0 OR c + d = 0 OR a + c = 0 OR b + d = 0 THEN 0
           ELSE CAST((CAST(1000000 AS DECIMAL(38,0)) * (a + b + c + d)
           * (CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c)
           * (CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c))
           div (CAST(a + b AS DECIMAL(38,0)) * (c + d) * (a + c) * (b + d))
           AS BIGINT) END""").as("chi2_micro"))
  }

  /** EXACT per-type value percentiles (p50/p90/p99) — the latency-band
    * report of every observability pipeline, computed with the
    * histogram + running-total decomposition that scales: aggregate to
    * (type, cents) counts FIRST (the value domain is bounded — cents, not
    * rows), then one window pass over the aggregate's output computes
    * cumulative counts, and each percentile is `min c with 100·cum ≥ q·n`
    * — the ceil-free integer formulation of `rank ≥ ⌈q·n/100⌉`. No
    * data-scale sort anywhere: the window's child is the histogram
    * aggregate (state-scale, the PlanAudit-sanctioned shape), and money
    * stays exact integer cents throughout.
    */
  def percentiles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cents = events(s, d)
      .select($"event_type", Money.cents($"value").as("c"))
    val hist = cents.groupBy($"event_type", $"c").agg(count(lit(1)).as("n"))
    percentileReadoff(hist)
  }

  /** Percentile read-off over a `(event_type, c, n)` histogram — shared
    * by the batch operator and the drained-stream variant
    * ([[StreamQueries.streamPercentiles]]), whose complete drain produces
    * the identical cells.
    *
    * Two EXACT paths, switched on histogram size (the round-7 review's
    * bounded-domain fallback):
    *
    *  - `≤ maxExactCells` cells: the direct shape — one per-type window
    *    over the histogram computes cumulative counts, each percentile is
    *    `min c with 100·cum ≥ q·nt` (the ceil-free integer form of
    *    `rank ≥ ⌈q·nt/100⌉`). The window partition is the per-type
    *    histogram, so this is only safe while the value domain is small.
    *  - above it: the two-phase bucketed shape — a per-type power-of-two
    *    bucket width `w` is chosen so the BUCKET histogram has at most
    *    `maxExactCells` rows per type; the per-type window then runs over
    *    buckets (bounded partition), locates for each quantile the single
    *    bucket its rank falls in, and a second pass — restricted by a
    *    broadcast semi-join to ONLY the ≤3 candidate buckets per type —
    *    reads off the exact cent value inside a ≤`w`-cell partition.
    *    Both window partitions are bounded by construction, so a type
    *    whose value domain explodes (micro-priced events, long-tail
    *    latencies) can no longer pin one hot partition. Results are
    *    bit-identical to the direct path (the bucket pass only NARROWS
    *    where the exact rank crossing is searched).
    */
  private[graft] def percentileReadoff(hist0: DataFrame,
      maxExactCells: Long = 262144L): DataFrame = {
    // one lineage-cut pass feeds the size probe AND whichever read-off
    // path wins; the per-type result is materialized through detach so
    // nothing stays pinned afterwards (eager localCheckpoint — the r14
    // probe measured it beating the lazy columnar persist)
    val hist = graft.plans.Caching.iterCheckpoint(hist0)
    val probeN = if (maxExactCells >= Int.MaxValue - 1) Int.MaxValue - 1
                 else maxExactCells.toInt + 1
    // size probe WITHOUT driver materialization (round-8 review): the
    // limit caps how much the probe touches, the count aggregates to one
    // long — a take() here would land up to maxExactCells+1 histogram
    // rows on the driver, exactly what detachSink exists to prevent
    val nCells = hist.limit(probeN).count()
    val out = if (nCells <= maxExactCells) readoffDirect(hist)
              else readoffBucketed(hist, maxExactCells)
    graft.plans.Caching.detach(out, () => graft.plans.Caching.freeCheckpoint(hist))
  }

  private def readoffDirect(hist: DataFrame): DataFrame = {
    import hist.sparkSession.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum($"n").over(w))
    val tot = hist.groupBy($"event_type").agg(sum($"n").as("nt"))
    cum.join(broadcast(tot), "event_type")
      .groupBy($"event_type")
      .agg(max($"nt").as("n_events"),
           min(when($"cum" * 100 >= $"nt" * 50, $"c")).as("p50_cents"),
           min(when($"cum" * 100 >= $"nt" * 90, $"c")).as("p90_cents"),
           min(when($"cum" * 100 >= $"nt" * 99, $"c")).as("p99_cents"),
           max($"c").as("max_cents"))
      .orderBy($"event_type")
  }

  /** Exact bucketed read-off: see [[percentileReadoff]] (which persists
    * the histogram for the two passes and frees it afterwards). */
  private def readoffBucketed(hist: DataFrame, maxCells: Long): DataFrame = {
    import hist.sparkSession.implicits._

    // per-type stats + smallest power-of-two width w with span/w ≤ maxCells
    val stats = hist.groupBy($"event_type")
      .agg(min($"c").as("cmin"), max($"c").as("cmax"), sum($"n").as("nt"))
      .withColumn("wexp",
        greatest(lit(0L), ceil(log2(($"cmax" - $"cmin" + 1)
          .cast("double") / maxCells.toDouble))).cast("int"))
      .select($"event_type", $"cmin", $"cmax", $"nt", $"wexp")

    // phase 1: bucket histogram (≤ maxCells rows per type) + per-type
    // cumulative over BUCKETS; the first bucket whose cumulative crosses
    // q·nt/100 contains the exact percentile cell. Bucketing is an exact
    // integer shift (width = 2^wexp), never a double division.
    val bucketOf = (c: org.apache.spark.sql.Column,
                    cmin: org.apache.spark.sql.Column,
                    wexp: org.apache.spark.sql.Column) =>
      call_function("shiftright", c - cmin, wexp)
    val bh = hist.join(broadcast(stats), "event_type")
      .withColumn("b", bucketOf($"c", $"cmin", $"wexp"))
      .groupBy($"event_type", $"b", $"wexp", $"cmin", $"nt")
      .agg(sum($"n").as("bn"))
    val wb = Window.partitionBy($"event_type").orderBy($"b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bcum = bh.withColumn("bcum", sum($"bn").over(wb))
    val qs = Seq(50L, 90L, 99L).toDF("q")
    val cand = bcum.crossJoin(broadcast(qs))
      .filter($"bcum" * 100 >= $"q" * $"nt" &&
              ($"bcum" - $"bn") * 100 < $"q" * $"nt")
      .select($"event_type", $"q", $"b", ($"bcum" - $"bn").as("cum_before"),
              $"wexp", $"cmin", $"nt")

    // phase 2: exact crossing inside the candidate bucket only — the
    // window partition is (type, q) with at most 2^wexp cells
    val cells = hist.as("h")
      .join(broadcast(cand).as("k"),
        $"h.event_type" === $"k.event_type" &&
        bucketOf($"h.c", $"k.cmin", $"k.wexp") === $"k.b")
      .select($"h.event_type".as("event_type"), $"k.q", $"h.c", $"h.n",
              $"k.cum_before", $"k.nt")
    val wq = Window.partitionBy($"event_type", $"q").orderBy($"c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exact = cells.withColumn("cum", $"cum_before" + sum($"n").over(wq))
      .filter($"cum" * 100 >= $"q" * $"nt")
      .groupBy($"event_type", $"q").agg(min($"c").as("pc"))
      .groupBy($"event_type")
      .agg(min(when($"q" === 50, $"pc")).as("p50_cents"),
           min(when($"q" === 90, $"pc")).as("p90_cents"),
           min(when($"q" === 99, $"pc")).as("p99_cents"))

    stats
      .select($"event_type", $"nt".as("n_events"), $"cmax".as("max_cents"))
      .join(exact, "event_type")
      .select($"event_type", $"n_events", $"p50_cents", $"p90_cents",
              $"p99_cents", $"max_cents")
      .orderBy($"event_type")
  }

  /** Semi-structured PROPS profiling — the JSON-column statistics pass
    * (schema discovery / data profiling over an opaque string column):
    * extract the numeric `k` property and roll up exact integer stats per
    * event type. Extraction is map-side codegen'd `get_json_object`; the
    * roll-up is one partial-agg'd groupBy of |types| rows. The distinct
    * count is exact (bounded k domain); everything is integer so both
    * engines agree bit-for-bit. */
  def propsStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = get_json_object($"props", "$.k").cast("long")
    events(s, d).select($"event_type", k.as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
           countDistinct($"k").as("k_distinct"),
           min($"k").as("k_min"),
           max($"k").as("k_max"),
           sum($"k").as("k_sum"))
      .orderBy($"event_type")
  }

  /** Robust daily-volume ANOMALY screen — the median/MAD detector every
    * monitoring pipeline runs per series (median and MAD shrug off the
    * very outliers a mean/stddev screen would absorb): daily event counts
    * per type, lower-median via the rank formulation `min n at rank ≥
    * ⌈days/2⌉` (pure integers — no float median of an even count), MAD =
    * the same formulation over |n − med|, and a day is anomalous iff
    * `dev > 3·mad` (exact integer comparison; a zero MAD degenerates to
    * flagging any deviation, the strictest consistent reading).
    *
    * Scale shape: daily counts are one partial-agg'd (type, day) shuffle
    * of calendar-bounded cells; both medians are windows OVER THE
    * AGGREGATE's bounded output (the PlanAudit-sanctioned shape); every
    * join broadcasts a |types|-row side. */
  def anomalies(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = ev(s, d)
      .groupBy($"event_type", expr("ms div 86400000").as("d"))
      .agg(count(lit(1)).as("n"))
    val nd = daily.groupBy($"event_type").agg(count(lit(1)).as("nd"))
    val wN = Window.partitionBy($"event_type").orderBy($"n", $"d")
    val med = daily.withColumn("r", row_number().over(wN))
      .join(broadcast(nd), "event_type")
      .filter($"r" * 2 >= $"nd")
      .groupBy($"event_type").agg(min($"n").as("med"))
    val dev = daily.join(broadcast(med), "event_type")
      .withColumn("dev", abs($"n" - $"med"))
    val wD = Window.partitionBy($"event_type").orderBy($"dev", $"d")
    val mad = dev.withColumn("r", row_number().over(wD))
      .join(broadcast(nd), "event_type")
      .filter($"r" * 2 >= $"nd")
      .groupBy($"event_type").agg(min($"dev").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
           max($"med").as("median_daily"),
           max($"mad").as("mad_daily"),
           sum(when($"dev" > lit(3L) * $"mad", 1L).otherwise(0L)).as("n_anomalies"),
           max($"dev").as("max_dev"))
      .orderBy($"event_type")
  }

  /** Exact moving LOWER-median of event value (integer cents) over each
    * type's trailing `frame`-event window — an order-statistic window no
    * Spark built-in covers (`percentile_approx` is a sketch and `median`
    * is not a window function). The frame is BOUNDED (7 rows), so
    * materializing it per row is constant work: `collect_list` over the
    * ROWS frame → `sort_array` → middle element; nothing unbounded ever
    * exists, and the window partitions by event_type (per-partition
    * state = frame size, no funnel). Lower median = element (n+1) div 2
    * of the sorted frame — exact and identical on both engines (no
    * interpolation). */
  def movingMedian(s: SparkSession, d: String, frame: Int = 7): DataFrame = {
    import s.implicits._
    val e = events(s, d).select($"event_id", $"event_type",
      unix_millis($"ts").as("ms"), Money.cents($"value").as("cents"))
    val w = Window.partitionBy($"event_type").orderBy($"ms", $"event_id")
      .rowsBetween(-(frame - 1), Window.currentRow)
    e.withColumn("arr", sort_array(collect_list($"cents").over(w)))
      .select($"event_type", $"event_id", $"cents",
        element_at($"arr", expr("CAST((size(arr) + 1) div 2 AS INT)"))
          .as("med_cents"),
        size($"arr").cast("long").as("n_frame"))
      .orderBy($"event_type", $"event_id")
  }

  /** [[movingMedian]]'s SCALE path — bit-identical output without the
    * one-partition-per-type window. The literal form's partition is every
    * event of a type: with a handful of types at 100× scale one task
    * sorts billions of rows, a hot-partition funnel the ROWS-frame bound
    * does nothing about (the frame bounds per-row STATE, not partition
    * size). The cure is the [[graft.plans.ScalableNtile.runningTotal]]
    * discipline applied to a trailing ROWS frame:
    *
    *  1. exact per-type rank `r` via [[graft.plans.ScalableNtile.groupedRank]]
    *     (range-partitioned composite key, no per-type funnel);
    *  2. chunk `c = (r−1) div C` — each (type, chunk) holds ≤ C rows;
    *  3. rows in a chunk's last `frame−1` ranks REPLICATE into the next
    *     chunk (`own = false`), so every owner row's full trailing frame
    *     is present in its own (type, chunk) partition: for owner rank r
    *     in chunk k>0, the needed ranks r−frame+1…r−1 ≥ kC−(frame−2) are
    *     exactly the replicated tail (requires C ≥ frame);
    *  4. the same sorted-frame read-off as the literal window, partitioned
    *     by (type, chunk), replicas dropped after serving as context.
    *
    * Parallelism is types × ceil(rows/C) instead of |types|; replication
    * overhead is (frame−1)/C per chunk — at the default C this is <0.1%.
    * EventsSpec proves bit-equality with the literal window; the chunk
    * size is deliberately small enough that the oracle corpus itself
    * exercises multi-chunk stitching. */
  def movingMedianChunked(s: SparkSession, d: String, frame: Int = 7,
      chunkRows: Int = 2048): DataFrame = {
    import s.implicits._
    require(chunkRows >= frame, "chunk must cover a full frame")
    val e = graft.plans.Caching.iterCheckpoint(
      events(s, d).select($"event_id", $"event_type",
        unix_millis($"ts").as("ms"), Money.cents($"value").as("cents")))
    val ranked = graft.plans.ScalableNtile.groupedRank(
      e, Seq("event_type"), Seq($"ms", $"event_id"), "r")
    // integer `div`, never float division — exact at any rank magnitude
    val owners = ranked
      .withColumn("chunk", expr(s"(r - 1) div ${chunkRows}L"))
      .withColumn("own", lit(true))
    val replicas = ranked
      .filter(expr(s"(r - 1) % ${chunkRows}L >= ${chunkRows - (frame - 1)}L"))
      .withColumn("chunk", expr(s"((r - 1) div ${chunkRows}L) + 1L"))
      .withColumn("own", lit(false))
    val w = Window.partitionBy($"event_type", $"chunk").orderBy($"r")
      .rowsBetween(-(frame - 1), Window.currentRow)
    val out = owners.unionByName(replicas)
      .withColumn("arr", sort_array(collect_list($"cents").over(w)))
      .filter($"own")
      .select($"event_type", $"event_id", $"cents",
        element_at($"arr", expr("CAST((size(arr) + 1) div 2 AS INT)"))
          .as("med_cents"),
        size($"arr").cast("long").as("n_frame"))
      .orderBy($"event_type", $"event_id")
    graft.plans.Caching.detach(out, () => graft.plans.Caching.freeCheckpoint(e))
  }

  /** SCD-TYPE-2 HISTORY — collapse each user's event-type stream into
    * validity intervals (the slowly-changing-dimension shape every
    * warehouse keeps for "what was this entity's attribute at time t"):
    * consecutive equal `event_type` runs become one version row with
    * `[valid_from, valid_to)` millis, the latest version open-ended
    * (`valid_to` NULL, `is_current` true).
    *
    * Classic gaps-and-islands: change flag = `lag(event_type) ≠ current`
    * over (user, ts, event_id), version id = running sum of flags, one
    * group-by to the interval row, `valid_to` = lead of the next
    * version's `valid_from`.
    *
    * Scale shape: both windows and the aggregate share ONE hash
    * partitioning on `user_id` (Spark reuses the exchange — the windows
    * sort within partitions only, no global sort), so the whole history
    * build is a single shuffle of `(user, type, ms)` triples; output is
    * version-count-sized. Per-user history is assumed memory-bounded
    * (human-scale event streams); a single pathological user is a skew
    * problem, not a window-correctness one. */
  /** Version frame shared by [[scd2History]] and [[asofAttribute]]:
    * gaps-and-islands collapse of `(user_id, event_id, event_type, ms)`
    * rows into `(user_id, ver, event_type, valid_from, n_events)`. */
  private def versionIslands(e: DataFrame): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
    e.withColumn("brk", when(lag($"event_type", 1).over(w).isNull ||
        lag($"event_type", 1).over(w) =!= $"event_type", 1L).otherwise(0L))
      .withColumn("ver", sum($"brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"ver", $"event_type")
      .agg(min($"ms").as("valid_from"), count(lit(1)).as("n_events"))
  }

  def scd2History(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val versions = versionIslands(ev(s, d))
    // `ver` tiebreak: two islands can collapse onto the same millisecond
    // (same-instant attribute flips — EdgeCaseSpec user 44); without it,
    // which version closes and which stays current is nondeterministic.
    val wv = Window.partitionBy($"user_id").orderBy($"valid_from", $"ver")
    versions
      .withColumn("valid_to", lead($"valid_from", 1).over(wv))
      .withColumn("is_current", $"valid_to".isNull)
      .select($"user_id", $"ver", $"event_type".as("attr"),
              $"valid_from", $"valid_to", $"n_events", $"is_current")
      .orderBy($"user_id", $"ver")
  }

  /** POINT-IN-TIME ATTRIBUTE LOOKUP — the consumer side of an SCD2
    * dimension: for every purchase, resolve the user's activity state
    * AS OF the purchase instant (the last non-purchase event-type
    * version whose `valid_from ≤ purchase ms`) and roll revenue up per
    * state. This is the "join facts to the dimension version that was
    * current at fact time" query every warehouse with history runs —
    * [[scd2History]] builds the history, this consumes it.
    *
    * The dimension is deduplicated to one version per `(user,
    * valid_from)` (max `ver` wins — [[Relational.q26AsofJoin]]'s
    * same-instant discipline) so the as-of carry is deterministic even
    * if two islands collapse onto one millisecond.
    *
    * Scale shape: [[graft.plans.TemporalJoins.asofJoin]] — union both
    * sides, ONE window pass per `user_id` partition carrying the latest
    * version payload forward; no range cross product, one shuffle. The
    * island build shares the same `user_id` partitioning. */
  def asofAttribute(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = events(s, d).select($"user_id", $"event_id", $"event_type",
      unix_millis($"ts").as("ms"), Money.cents($"value").as("cents"))
    val dim = versionIslands(
        base.filter($"event_type" =!= "purchase")
          .select($"user_id", $"event_id", $"event_type", $"ms"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id", $"valid_from").orderBy($"ver".desc)))
      .filter($"rn" === 1)
      .select($"user_id", $"valid_from".as("ms"), $"event_type".as("attr"))
    val facts = base.filter($"event_type" === "purchase")
      .select($"user_id", $"ms", $"cents")
    graft.plans.TemporalJoins.asofJoin(facts, dim, "user_id", "ms", Seq("attr"))
      .groupBy(coalesce($"asof_attr", lit("none")).as("attr"))
      .agg(count(lit(1)).as("n_purchases"),
           countDistinct($"user_id").as("n_users"),
           sum($"cents").as("revenue_cents"))
      .orderBy($"attr")
  }

  /** HOLT FORECAST — exact double-exponential smoothing of daily revenue
    * per event type (the capacity-planning curve every events pipeline
    * projects): with α = β = ½ both smoothing updates are integral
    * halvings, so the whole recurrence is integer-exact and
    * engine-portable — Scala's `/` on Long and DuckDB's `//` BOTH
    * truncate toward zero (measured: `-7 // 2 = -3` in DuckDB 1.0; a
    * floor division like `Math.floorDiv` would diverge on negative
    * trends — the first draft's bug). Emits the final level/trend, the
    * 1/2/3-step-ahead forecasts, and the summed absolute one-step
    * in-sample error.
    *
    * The recurrence is inherently sequential in time, so it runs in
    * `mapGroups` — but over the DAY-AGGREGATED frame, never raw events:
    * the one data-scale pass is the (type, day) partial-agg'd revenue
    * roll-up; the per-group series is |days|-sized metadata. The oracle
    * replays the fold with a recursive CTE walking `i → i+1` over
    * row-numbered days. */
  def holtForecast(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = events(s, d)
      .groupBy($"event_type", expr("unix_millis(ts) div 86400000").as("day"))
      .agg(sum(Money.cents($"value")).as("cents"))
    daily.select($"event_type", $"day", $"cents").as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (t, it) =>
        val ys = it.toArray.sortBy(_._2).map(_._3)
        var l = ys(0)
        var b = if (ys.length > 1) ys(1) - ys(0) else 0L
        var sae = 0L
        var i = 1
        while (i < ys.length) {
          val pred = l + b
          sae += math.abs(ys(i) - pred)
          val l1 = (ys(i) + l + b) / 2L
          b = (l1 - l + b) / 2L
          l = l1
          i += 1
        }
        (t, ys.length.toLong, l, b, l + b, l + 2 * b, l + 3 * b, sae)
      }
      .toDF("event_type", "n_days", "level", "trend", "f1", "f2", "f3",
            "sae_cents")
      .orderBy($"event_type")
  }

  /** Per-user sessions kept at SESSION grain with their closed
    * `[s_ms, e_ms]` millisecond intervals — the gaps-and-islands pass of
    * [[sessions]] before its global roll-up, shared by the interval-join
    * ([[sessionOverlap]]) and sweep-line ([[concurrency]]) operators so
    * all three agree on what a session is. */
  private[graft] def sessionIntervals(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
    ev(s, d)
      .withColumn("brk", when(lag($"ms", 1).over(w).isNull ||
        $"ms" - lag($"ms", 1).over(w) > SessionGapMs, 1L).otherwise(0L))
      .withColumn("sid", sum($"brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sid")
      .agg(min($"ms").as("s_ms"), max($"ms").as("e_ms"))
  }

  /** Grid cell width for [[sessionOverlap]]'s bucketized interval join —
    * sized to the session-duration distribution (sessions are gap-bounded
    * minutes-scale; an hour cell keeps per-session fan-out ≤2 cells while
    * keeping per-cell population far below all-pairs density). Shared with
    * nothing: the oracle replays the JOIN SEMANTICS (a plain non-equi
    * join), not the grid — the grid is pure plan, invisible in the result. */
  private val OverlapCellMs = 3600000L

  /** INTERVAL OVERLAP JOIN — "which sessions of DIFFERENT users ran
    * concurrently", the canonical large×large interval-join problem
    * (conflict detection, co-presence, contention analysis). A naive
    * formulation is a non-equi θ-join (`a.s ≤ b.e AND b.s ≤ a.e`), which
    * Spark can only execute as a broadcast nested loop or cartesian — both
    * detonate at scale. The scale plan is GRID BUCKETIZATION: each session
    * explodes onto the fixed time cells it touches ([[OverlapCellMs]]),
    * candidates equi-join ON THE CELL, and the overlap predicate filters
    * survivors. Two sessions overlap ⇒ they share the cell containing the
    * later start, so requiring `cell = greatest(s_a,s_b) div G` counts
    * every true pair EXACTLY ONCE — the owner-cell trick that removes the
    * pair-dedup `distinct` (and its full-candidate shuffle) entirely.
    *
    * 100 TB: fan-out is duration/G (+1) cells per session — bounded by the
    * session gap discipline; candidate volume is Σ_cell n_cell², governed
    * by REAL temporal density rather than corpus size, and a hot cell
    * (thundering-herd hour) is a standard AQE-skew/salting target. Same-
    * user pairs can't overlap (a user's sessions are gap-disjoint by
    * construction) and are excluded with the orientation pin `ua < ub`.
    * Output is day-bounded: pairs, overlap mass, peak single overlap, the
    * uid checksum, and distinct users participating. */
  /** The grid-bucketized overlap pair frame over an interval frame — the
    * subplan [[sessionOverlap]] materializes through its pair checkpoint;
    * factored so IntervalJoinSpec can assert the join shape (equi-join on
    * the cell, owner-cell filter) on the exact expressions production
    * executes. */
  private[graft] def overlapPairs(iv: DataFrame): DataFrame = {
    val s = iv.sparkSession
    import s.implicits._
    val g = OverlapCellMs
    val cells = iv
      .select($"user_id", $"s_ms", $"e_ms",
        explode(sequence(expr(s"s_ms div $g"), expr(s"e_ms div $g"))).as("cell"))
    val a = cells.select($"cell", $"user_id".as("ua"), $"s_ms".as("sa"),
      $"e_ms".as("ea"))
    val b = cells.select($"cell", $"user_id".as("ub"), $"s_ms".as("sb"),
      $"e_ms".as("eb"))
    a.join(b, Seq("cell"))
      .filter($"ua" < $"ub" && $"sa" <= $"eb" && $"sb" <= $"ea" &&
        $"cell" === expr(s"greatest(sa, sb) div $g"))
      .select(expr("greatest(sa, sb) div 86400000").as("day"),
        (least($"ea", $"eb") - greatest($"sa", $"sb")).as("ov_ms"),
        $"ua", $"ub")
  }

  def sessionOverlap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // the interval frame feeds both join sides and the pair frame feeds
    // both the per-day aggregate and the distinct-user roll-up — cut the
    // lineage at each so the gaps-and-islands windows run once and the
    // grid join runs once, not 2×/3× (eager localCheckpoint — probe-
    // measured faster than both lazy recompute and a lazy persist); both
    // frames are session-/pair-grain, far below event grain
    val iv = graft.plans.Caching.iterCheckpoint(sessionIntervals(s, d))
    val pairsCk = graft.plans.Caching.iterCheckpoint(overlapPairs(iv))
    val perDay = pairsCk.groupBy($"day")
      .agg(count(lit(1)).as("n_pairs"), sum($"ov_ms").as("overlap_ms_sum"),
           max($"ov_ms").as("overlap_ms_max"), sum($"ua" + $"ub").as("uid_sum"))
    val users = pairsCk.select($"day", $"ua".as("uid"))
      .unionByName(pairsCk.select($"day", $"ub".as("uid")))
      .groupBy($"day").agg(countDistinct($"uid").as("n_users"))
    val out = perDay.join(users, Seq("day")).orderBy($"day")
    graft.plans.Caching.detach(out, () => {
      graft.plans.Caching.freeCheckpoint(iv)
      graft.plans.Caching.freeCheckpoint(pairsCk)
    })
  }

  /** SWEEP-LINE CONCURRENCY — peak simultaneous sessions per day, the
    * aggregate twin of [[sessionOverlap]] (that one enumerates WHO
    * overlapped; this one tracks HOW MANY were open). Classic boundary
    * decomposition: each closed session `[s,e]` emits `+1@s` and
    * `-1@(e+1)`, deltas collapse per distinct millisecond (so the level is
    * well-defined regardless of within-ms processing order), and the open-
    * session level is the INCLUSIVE running sum of the net deltas — which
    * [[graft.plans.ScalableNtile.runningTotal]] computes by range
    * decomposition, NOT a single-partition global window: the sweep line,
    * usually the textbook example of inherently-sequential, distributes.
    *
    * 100 TB: boundaries are 2 rows/session (session-scale, already far
    * below event-scale), the delta collapse is a partial-agg'd groupBy,
    * and the prefix sum is the P-range decomposition with a P-row offset
    * frame. Level between boundaries is constant, so per-day max over
    * boundary rows IS the day's true peak (days with zero boundaries are
    * absent on both engines identically). */
  def concurrency(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // The session-interval frame is consumed by BOTH union branches, and
    // the running total's range decomposition makes four more passes over
    // its input (count, boundary sample, offsets, rank) — without a
    // lineage cut the gaps-and-islands window pipeline re-executes up to
    // 8× (probe-measured r14 at sf0.1: lazy 4.6s, lazy persist 5.3s —
    // the columnar InMemoryRelation costs MORE than recompute here —
    // eager localCheckpoint 2.3s). Session grain is already far below
    // event grain, so the checkpointed footprint is interval rows only;
    // detach frees it once the day-level result materializes.
    val iv = graft.plans.Caching.iterCheckpoint(sessionIntervals(s, d))
    val deltas = iv.select($"s_ms".as("ms"), lit(1L).as("delta"))
      .unionByName(iv.select(($"e_ms" + 1L).as("ms"), lit(-1L).as("delta")))
      .groupBy($"ms").agg(sum($"delta").as("net"))
    val out = graft.plans.ScalableNtile
      .runningTotal(deltas, $"net", Seq($"ms"), "level")
      .groupBy(expr("ms div 86400000").as("day"))
      .agg(max($"level").as("max_concurrent"),
           count(lit(1)).as("n_boundary_ms"),
           sum($"net").as("net_day"))
      .orderBy($"day")
    graft.plans.Caching.detach(out, () => graft.plans.Caching.freeCheckpoint(iv))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nd_join_interval" -> sessionOverlap _,
    "nd_events_concurrency" -> concurrency _,
    "nd_events_forecast" -> holtForecast _,
    "nd_events_scd2" -> scd2History _,
    "nd_events_asof_attr" -> asofAttribute _,
    "nd_events_moving_median" -> ((s: SparkSession, d: String) => movingMedian(s, d)),
    "nd_events_moving_median_scalable" ->
      ((s: SparkSession, d: String) => movingMedianChunked(s, d)),
    "nd_events_funnel" -> funnel _,
    "nd_events_retention" -> retention _,
    "nd_events_rolling" -> rollingActive _,
    "nd_events_cumulative_distinct" -> cumulativeDistinct _,
    "nd_events_sessions" -> sessions _,
    "nd_events_gapfill" -> gapfill _,
    "nd_events_paths" -> paths _,
    "nd_events_attribution" -> attribution _,
    "nd_events_abtest" -> abTest _,
    "nd_events_percentiles" -> percentiles _,
    "nd_events_props" -> propsStats _,
    "nd_events_anomaly" -> anomalies _)

  def oracle: Map[String, String] = Map(
    // Interval-join replay: the oracle states the SEMANTICS as the naive
    // non-equi self-join over the shared gaps-and-islands session CTE —
    // the Spark side's grid bucketing + owner-cell counting must be
    // result-invisible, which is exactly what this asymmetry proves.
    "nd_join_interval" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
         g AS (SELECT user_id, event_id, ms,
                      CASE WHEN lag(ms) OVER w IS NULL
                             OR ms - lag(ms) OVER w > 1800000
                           THEN 1 ELSE 0 END AS brk
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         sid AS (SELECT user_id, ms,
                        sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sid
                 FROM g),
         sess AS (SELECT user_id, sid, min(ms) AS s, max(ms) AS e
                  FROM sid GROUP BY user_id, sid),
         p AS (SELECT greatest(a.s, b.s) // 86400000 AS day,
                      least(a.e, b.e) - greatest(a.s, b.s) AS ov_ms,
                      a.user_id AS ua, b.user_id AS ub
               FROM sess a JOIN sess b
                 ON a.user_id < b.user_id AND a.s <= b.e AND b.s <= a.e),
         d AS (SELECT day, CAST(count(*) AS BIGINT) AS n_pairs,
                      CAST(sum(ov_ms) AS BIGINT) AS overlap_ms_sum,
                      max(ov_ms) AS overlap_ms_max,
                      CAST(sum(ua + ub) AS BIGINT) AS uid_sum
               FROM p GROUP BY day),
         u AS (SELECT day, count(DISTINCT uid) AS n_users FROM (
                 SELECT day, ua AS uid FROM p
                 UNION ALL SELECT day, ub FROM p) GROUP BY day)
         SELECT d.day, n_pairs, overlap_ms_sum, overlap_ms_max, uid_sum, n_users
         FROM d JOIN u ON d.day = u.day ORDER BY d.day""",
    // Sweep-line replay: same session CTE, ±1 boundary deltas collapsed
    // per distinct ms, one running-sum window (tractable at oracle SF;
    // the Spark side range-decomposes the same prefix sum).
    "nd_events_concurrency" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
         g AS (SELECT user_id, event_id, ms,
                      CASE WHEN lag(ms) OVER w IS NULL
                             OR ms - lag(ms) OVER w > 1800000
                           THEN 1 ELSE 0 END AS brk
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         sid AS (SELECT user_id, ms,
                        sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sid
                 FROM g),
         sess AS (SELECT user_id, sid, min(ms) AS s, max(ms) AS e
                  FROM sid GROUP BY user_id, sid),
         b AS (SELECT s AS ms, 1 AS delta FROM sess
               UNION ALL SELECT e + 1, -1 FROM sess),
         n AS (SELECT ms, CAST(sum(delta) AS BIGINT) AS net FROM b GROUP BY ms),
         l AS (SELECT ms, net,
                      CAST(sum(net) OVER (ORDER BY ms ROWS UNBOUNDED PRECEDING)
                           AS BIGINT) AS level
               FROM n)
         SELECT ms // 86400000 AS day, max(level) AS max_concurrent,
                CAST(count(*) AS BIGINT) AS n_boundary_ms,
                CAST(sum(net) AS BIGINT) AS net_day
         FROM l GROUP BY 1 ORDER BY 1""",
    // Holt replay: row-numbered day series, recursive CTE carrying
    // (level, trend, sae) one day per step; // truncates toward zero
    // exactly like the Scala kernel's Long division
    "nd_events_forecast" ->
      """WITH RECURSIVE
         e AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
                      CAST(sum(CAST(round("value" * 100) AS BIGINT)) AS BIGINT) AS cents
               FROM events GROUP BY 1, 2),
         o AS (SELECT event_type, day, cents,
                      row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
               FROM e),
         nn AS (SELECT event_type, CAST(max(i) AS BIGINT) AS n_days
                FROM o GROUP BY event_type),
         init AS (SELECT o1.event_type, o1.cents AS l,
                         CAST(coalesce(o2.cents - o1.cents, 0) AS BIGINT) AS b
                  FROM o o1 LEFT JOIN o o2
                    ON o1.event_type = o2.event_type AND o2.i = 2
                  WHERE o1.i = 1),
         r AS (SELECT event_type, CAST(1 AS BIGINT) AS i, l, b,
                      CAST(0 AS BIGINT) AS sae
               FROM init
               UNION ALL
               SELECT r.event_type, r.i + 1,
                      CAST((o.cents + r.l + r.b) // 2 AS BIGINT),
                      CAST((((o.cents + r.l + r.b) // 2) - r.l + r.b) // 2 AS BIGINT),
                      CAST(r.sae + abs(o.cents - (r.l + r.b)) AS BIGINT)
               FROM r JOIN o ON o.event_type = r.event_type AND o.i = r.i + 1)
         SELECT r.event_type, nn.n_days,
                CAST(r.l AS BIGINT) AS level, CAST(r.b AS BIGINT) AS trend,
                CAST(r.l + r.b AS BIGINT) AS f1,
                CAST(r.l + 2 * r.b AS BIGINT) AS f2,
                CAST(r.l + 3 * r.b AS BIGINT) AS f3,
                r.sae AS sae_cents
         FROM r JOIN nn USING (event_type)
         WHERE r.i = nn.n_days ORDER BY r.event_type""",
    // point-in-time replay: same non-purchase islands, same
    // one-version-per-(user, instant) dedup, DuckDB's native ASOF LEFT
    // JOIN as the independent formulation of the as-of carry
    "nd_events_asof_attr" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
                           CAST(round("value" * 100) AS BIGINT) AS cents
                    FROM events),
         d AS (SELECT user_id, event_id, event_type, ms
               FROM e WHERE event_type <> 'purchase'),
         g AS (SELECT user_id, event_id, event_type, ms,
                      CASE WHEN lag(event_type) OVER w IS NULL
                             OR lag(event_type) OVER w <> event_type
                           THEN 1 ELSE 0 END AS brk
               FROM d WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         v AS (SELECT user_id, event_type, ms,
                      sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
                                     ROWS UNBOUNDED PRECEDING) AS ver
               FROM g),
         h AS (SELECT user_id, ver, event_type AS attr,
                      CAST(min(ms) AS BIGINT) AS valid_from
               FROM v GROUP BY user_id, ver, event_type),
         -- MATERIALIZED: DuckDB rewrites ASOF into a lateral and refuses
         -- window functions inlined into the lateral branch; arg_max (not
         -- row_number) for the same reason
         hv AS MATERIALIZED (SELECT user_id, valid_from, arg_max(attr, ver) AS attr
                             FROM h GROUP BY user_id, valid_from),
         f AS (SELECT user_id, ms, cents FROM e WHERE event_type = 'purchase'),
         j AS (SELECT f.user_id, f.cents, hv.attr
               FROM f ASOF LEFT JOIN hv
                 ON f.user_id = hv.user_id AND f.ms >= hv.valid_from)
         SELECT coalesce(attr, 'none') AS attr,
                CAST(count(*) AS BIGINT) AS n_purchases,
                CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                CAST(sum(cents) AS BIGINT) AS revenue_cents
         FROM j GROUP BY 1 ORDER BY attr""",
    // SCD2 replay: same lag-flag islands, running-sum version ids, and
    // lead(valid_from) interval close
    "nd_events_scd2" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms
                    FROM events),
         g AS (SELECT user_id, event_id, event_type, ms,
                      CASE WHEN lag(event_type) OVER w IS NULL
                             OR lag(event_type) OVER w <> event_type
                           THEN 1 ELSE 0 END AS brk
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         v AS (SELECT user_id, event_type, ms,
                      sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
                                     ROWS UNBOUNDED PRECEDING) AS ver
               FROM g),
         h AS (SELECT user_id, ver, event_type,
                      CAST(min(ms) AS BIGINT) AS valid_from,
                      CAST(count(*) AS BIGINT) AS n_events
               FROM v GROUP BY user_id, ver, event_type)
         SELECT user_id, CAST(ver AS BIGINT) AS ver, event_type AS attr,
                valid_from,
                CAST(lead(valid_from) OVER (PARTITION BY user_id
                                            ORDER BY valid_from, ver) AS BIGINT)
                  AS valid_to,
                n_events,
                lead(valid_from) OVER (PARTITION BY user_id
                                       ORDER BY valid_from, ver) IS NULL AS is_current
         FROM h ORDER BY user_id, ver""",
    "nd_events_moving_median" ->
      """WITH e AS (SELECT event_id, event_type, epoch_ms(ts) AS ms,
                           CAST(round(value * 100) AS BIGINT) AS cents
                    FROM events),
         w AS (SELECT event_type, event_id, cents,
                      list_sort(list(cents) OVER (PARTITION BY event_type
                        ORDER BY ms, event_id
                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
               FROM e)
         SELECT event_type, event_id, cents,
                CAST(arr[(len(arr) + 1) // 2] AS BIGINT) AS med_cents,
                CAST(len(arr) AS BIGINT) AS n_frame
         FROM w ORDER BY event_type, event_id""",
    // the chunked scale path answers the SAME question — one oracle text,
    // two plans (the q05/q35 ntile pattern)
    "nd_events_moving_median_scalable" ->
      """WITH e AS (SELECT event_id, event_type, epoch_ms(ts) AS ms,
                           CAST(round(value * 100) AS BIGINT) AS cents
                    FROM events),
         w AS (SELECT event_type, event_id, cents,
                      list_sort(list(cents) OVER (PARTITION BY event_type
                        ORDER BY ms, event_id
                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
               FROM e)
         SELECT event_type, event_id, cents,
                CAST(arr[(len(arr) + 1) // 2] AS BIGINT) AS med_cents,
                CAST(len(arr) AS BIGINT) AS n_frame
         FROM w ORDER BY event_type, event_id""",
    // the same distinct-activity fan-out formulation — never a windowed
    // distinct — with HUGEINT-widened stickiness
    "nd_events_rolling" ->
      """WITH e AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day
                    FROM events),
         days AS (SELECT DISTINCT day FROM e),
         j AS (SELECT r.day AS day, e.user_id, e.day AS aday
               FROM e JOIN days r ON r.day >= e.day AND r.day <= e.day + 6)
         SELECT day,
           CAST(count(DISTINCT CASE WHEN aday = day THEN user_id END) AS BIGINT) AS dau,
           CAST(count(DISTINCT user_id) AS BIGINT) AS wau,
           CAST(CAST(count(DISTINCT CASE WHEN aday = day THEN user_id END) AS HUGEINT)
                * 1000000 // count(DISTINCT user_id) AS BIGINT) AS stickiness_micro
         FROM j GROUP BY day ORDER BY day""",
    // running SUM of per-day first-seen counts ≡ cumulative distinct —
    // the oracle spells the equivalence the Spark side exploits
    "nd_events_cumulative_distinct" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
         daily AS (SELECT day, count(DISTINCT user_id) AS dau FROM e GROUP BY day),
         f AS (SELECT user_id, min(day) AS fday FROM e GROUP BY user_id),
         nu AS (SELECT fday AS day, count(*) AS new_users FROM f GROUP BY fday)
         SELECT daily.day AS day, CAST(dau AS BIGINT) AS dau,
                CAST(coalesce(new_users, 0) AS BIGINT) AS new_users,
                CAST(sum(coalesce(new_users, 0)) OVER (ORDER BY daily.day
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
         FROM daily LEFT JOIN nu ON daily.day = nu.day
         ORDER BY day""",
    "nd_events_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
         u AS (SELECT user_id,
                      min(CASE WHEN event_type = 'view' THEN ms END) AS v
               FROM e GROUP BY user_id),
         uc AS (SELECT u.user_id, u.v,
                       min(CASE WHEN e.event_type = 'click' AND e.ms > u.v
                           THEN e.ms END) AS c
                FROM u JOIN e ON e.user_id = u.user_id GROUP BY u.user_id, u.v),
         up AS (SELECT uc.user_id, uc.v, uc.c,
                       min(CASE WHEN e.event_type = 'purchase' AND e.ms > uc.c
                           THEN e.ms END) AS p
                FROM uc JOIN e ON e.user_id = uc.user_id
                GROUP BY uc.user_id, uc.v, uc.c)
         SELECT count(*) AS users_total,
                count(v) AS users_view,
                count(c) AS users_click,
                count(p) AS users_purchase,
                CAST(sum(c - v) // count(c) AS BIGINT) AS avg_view_to_click_ms,
                CAST(sum(p - c) // count(p) AS BIGINT) AS avg_click_to_purchase_ms
         FROM up""",
    "nd_events_retention" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) // 86400000 AS d FROM events),
         f AS (SELECT user_id, min(d) AS d0 FROM e GROUP BY user_id)
         SELECT f.d0 // 7 AS cohort_week, (e.d - f.d0) // 7 AS offset_week,
                count(DISTINCT e.user_id) AS active_users
         FROM e JOIN f ON e.user_id = f.user_id
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "nd_events_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
         g AS (SELECT user_id, event_id, ms,
                      CASE WHEN lag(ms) OVER w IS NULL
                             OR ms - lag(ms) OVER w > 1800000
                           THEN 1 ELSE 0 END AS brk
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         sid AS (SELECT user_id, ms,
                        sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sid
                 FROM g),
         sess AS (SELECT user_id, sid, count(*) AS n_events,
                         max(ms) - min(ms) AS dur_ms
                  FROM sid GROUP BY user_id, sid)
         SELECT count(*) AS n_sessions,
                count(DISTINCT user_id) AS n_users,
                CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS single_event_sessions,
                max(n_events) AS max_session_events,
                max(dur_ms) AS max_session_ms,
                CAST(sum(dur_ms) AS BIGINT) AS total_session_ms,
                CAST(sum(n_events) // count(*) AS BIGINT) AS avg_events_per_session
         FROM sess""",
    "nd_events_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events),
         g AS (SELECT user_id, event_type,
                      lag(event_type) OVER w AS prev,
                      lead(event_type) OVER w AS nxt
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         t AS (SELECT coalesce(prev, 'START') AS from_type, event_type AS to_type FROM g
               UNION ALL
               SELECT event_type, 'END' FROM g WHERE nxt IS NULL)
         SELECT from_type, to_type, count(*) AS n
         FROM t GROUP BY 1, 2 ORDER BY n DESC, from_type, to_type""",
    "nd_events_attribution" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
                           CAST(round(value * 100) AS BIGINT) AS cents
                    FROM events),
         t AS (SELECT *,
                      first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                                  IGNORE NULLS)
                        OVER (PARTITION BY user_id ORDER BY ms, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ft,
                      last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                                 IGNORE NULLS)
                        OVER (PARTITION BY user_id ORDER BY ms, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
               FROM e),
         p AS (SELECT coalesce(ft, 'direct') AS ft, coalesce(lt, 'direct') AS lt, cents
               FROM t WHERE event_type = 'purchase'),
         bf AS (SELECT ft AS channel, count(*) AS n_first, sum(cents) AS first_touch_cents
                FROM p GROUP BY 1),
         bl AS (SELECT lt AS channel, count(*) AS n_last, sum(cents) AS last_touch_cents
                FROM p GROUP BY 1)
         SELECT coalesce(bf.channel, bl.channel) AS channel,
                coalesce(n_first, 0) AS n_first,
                CAST(coalesce(first_touch_cents, 0) AS BIGINT) AS first_touch_cents,
                coalesce(n_last, 0) AS n_last,
                CAST(coalesce(last_touch_cents, 0) AS BIGINT) AS last_touch_cents
         FROM bf FULL OUTER JOIN bl ON bf.channel = bl.channel
         ORDER BY channel""",
    "nd_events_abtest" ->
      """WITH u AS (SELECT user_id,
                           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
                    FROM events GROUP BY user_id),
         cells AS (SELECT
             CAST(sum(CASE WHEN user_id % 2 = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN user_id % 2 = 0 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN user_id % 2 = 1 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN user_id % 2 = 1 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
           FROM u)
         SELECT a, b, c, d, a + b + c + d AS n_users,
                CASE WHEN a + b = 0 OR c + d = 0 OR a + c = 0 OR b + d = 0 THEN 0
                     ELSE CAST((1000000::HUGEINT * (a + b + c + d)
                                * (a::HUGEINT * d - b::HUGEINT * c)
                                * (a::HUGEINT * d - b::HUGEINT * c))
                               // ((a + b)::HUGEINT * (c + d) * (a + c) * (b + d))
                               AS BIGINT) END AS chi2_micro
         FROM cells""",
    "nd_events_anomaly" ->
      """WITH daily AS (SELECT event_type, epoch_ms(ts) // 86400000 AS d,
                               CAST(count(*) AS BIGINT) AS n
                        FROM events GROUP BY 1, 2),
         nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nd FROM daily GROUP BY 1),
         medr AS (SELECT event_type, n,
                         row_number() OVER (PARTITION BY event_type ORDER BY n, d) AS r
                  FROM daily),
         med AS (SELECT m.event_type, min(n) AS med
                 FROM medr m JOIN nd USING (event_type)
                 WHERE r * 2 >= nd GROUP BY m.event_type),
         dev AS (SELECT daily.event_type, d, n, med, abs(n - med) AS dev
                 FROM daily JOIN med USING (event_type)),
         madr AS (SELECT event_type, dev,
                         row_number() OVER (PARTITION BY event_type ORDER BY dev, d) AS r
                  FROM dev),
         mad AS (SELECT m.event_type, min(dev) AS mad
                 FROM madr m JOIN nd USING (event_type)
                 WHERE r * 2 >= nd GROUP BY m.event_type)
         SELECT dev.event_type, CAST(count(*) AS BIGINT) AS n_days,
                max(med) AS median_daily, max(mad) AS mad_daily,
                CAST(sum(CASE WHEN dev > 3 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
                max(dev) AS max_dev
         FROM dev JOIN mad USING (event_type)
         GROUP BY dev.event_type ORDER BY dev.event_type""",
    "nd_events_percentiles" ->
      """WITH c AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events),
         hist AS (SELECT event_type, c, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1, 2),
         cum AS (SELECT event_type, c, n,
                        sum(n) OVER (PARTITION BY event_type ORDER BY c
                                     ROWS UNBOUNDED PRECEDING) AS cum
                 FROM hist),
         tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS nt FROM hist GROUP BY 1)
         SELECT event_type, max(nt) AS n_events,
                min(CASE WHEN cum * 100 >= nt * 50 THEN c END) AS p50_cents,
                min(CASE WHEN cum * 100 >= nt * 90 THEN c END) AS p90_cents,
                min(CASE WHEN cum * 100 >= nt * 99 THEN c END) AS p99_cents,
                max(c) AS max_cents
         FROM cum JOIN tot USING (event_type)
         GROUP BY event_type ORDER BY event_type""",
    "nd_events_props" ->
      """SELECT event_type,
                CAST(count(*) AS BIGINT) AS n,
                CAST(count(DISTINCT CAST(json_extract_string(props, 'k') AS BIGINT)) AS BIGINT) AS k_distinct,
                min(CAST(json_extract_string(props, 'k') AS BIGINT)) AS k_min,
                max(CAST(json_extract_string(props, 'k') AS BIGINT)) AS k_max,
                CAST(sum(CAST(json_extract_string(props, 'k') AS BIGINT)) AS BIGINT) AS k_sum
         FROM events GROUP BY event_type ORDER BY event_type""",
    "nd_events_gapfill" ->
      """WITH daily AS (SELECT user_id, epoch_ms(ts) // 86400000 AS d, count(*) AS cnt
                        FROM events GROUP BY 1, 2),
         span AS (SELECT user_id, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY 1),
         cal AS (SELECT user_id, unnest(generate_series(d0, d1)) AS d FROM span),
         j AS (SELECT c.user_id, c.d, daily.cnt,
                      CASE WHEN daily.cnt IS NOT NULL THEN c.d END AS active_d
               FROM cal c LEFT JOIN daily ON daily.user_id = c.user_id AND daily.d = c.d),
         f AS (SELECT user_id, d, cnt, active_d,
                      last_value(cnt IGNORE NULLS)
                        OVER (PARTITION BY user_id ORDER BY d
                              ROWS UNBOUNDED PRECEDING) AS filled,
                      active_d - lag(active_d)
                        OVER (PARTITION BY user_id ORDER BY active_d NULLS LAST) - 1
                        AS gap
               FROM j)
         SELECT user_id, max(d) - min(d) + 1 AS span_days,
                count(cnt) AS active_days,
                count(*) - count(cnt) AS zero_days,
                coalesce(max(gap), 0) AS max_gap_days,
                CAST(sum(filled) AS BIGINT) AS locf_sum
         FROM f GROUP BY user_id ORDER BY user_id""")
}
