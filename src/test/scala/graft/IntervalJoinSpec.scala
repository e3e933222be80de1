package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Events

/** Interval-overlap join ([[Events.sessionOverlap]]) and sweep-line
  * concurrency ([[Events.concurrency]]): the grid-bucketized join must be
  * RESULT-INVISIBLE (equal to the naive non-equi θ-join it replaces) while
  * executing as an equi-join, and the two operators must agree on the
  * story they tell about the same session intervals. */
class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p: SparkPlan => p.toString
    }
  }

  test("grid-bucketized overlap equals the naive non-equi join, day by day") {
    import spark.implicits._
    val iv = Events.sessionIntervals(spark, sf)
    val a = iv.select($"user_id".as("ua"), $"s_ms".as("sa"), $"e_ms".as("ea"))
    val b = iv.select($"user_id".as("ub"), $"s_ms".as("sb"), $"e_ms".as("eb"))
    // ground truth: the O(n^2) formulation the grid plan must reproduce
    val naive = a.join(b,
        $"ua" < $"ub" && $"sa" <= $"eb" && $"sb" <= $"ea", "inner")
      .select(expr("greatest(sa, sb) div 86400000").as("day"),
        (least($"ea", $"eb") - greatest($"sa", $"sb")).as("ov_ms"),
        ($"ua" + $"ub").as("us"))
      .groupBy($"day")
      .agg(count(lit(1)).as("n_pairs"), sum($"ov_ms").as("overlap_ms_sum"),
        max($"ov_ms").as("overlap_ms_max"), sum($"us").as("uid_sum"))
      .orderBy($"day")
      .collect().toSeq
    val grid = Events.sessionOverlap(spark, sf)
      .select($"day", $"n_pairs", $"overlap_ms_sum", $"overlap_ms_max", $"uid_sum")
      .collect().toSeq
    assert(grid == naive, "grid bucketing changed the join result")
    assert(grid.map(_.getLong(1)).sum > 0, "fixture produced no overlap pairs")
  }

  test("the overlap join executes as an equi-join on the cell, not a loop join") {
    // sessionOverlap now detach-materializes (r14: the interval and pair
    // frames are lineage-cut), so the registry entry's plan is a
    // LocalRelation — assert on the factored pair subplan, the exact
    // expressions the production path materializes through its checkpoint
    val plan = executed(Events.overlapPairs(Events.sessionIntervals(spark, sf)))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join fell back to a loop join:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"no equi-join on the grid cell:\n$plan")
  }

  test("sweep line: every session closes (net zero) and peaks match the pair view") {
    import spark.implicits._
    val conc = Events.concurrency(spark, sf).collect()
    assert(conc.map(_.getLong(3)).sum == 0L,
      "+1/-1 boundary deltas must cancel over the full span")
    val maxLevel = conc.map(_.getLong(1)).max
    val nPairs = Events.sessionOverlap(spark, sf)
      .agg(sum($"n_pairs")).head().getLong(0)
    // two views of the same intervals: a level >= 2 instant exists iff
    // some cross-user pair overlaps (same-user sessions are disjoint)
    assert((maxLevel >= 2) == (nPairs > 0),
      s"sweep line (max=$maxLevel) and pair join (pairs=$nPairs) disagree")
    // peak concurrency k implies at least C(k,2) overlapping pairs
    assert(nPairs >= maxLevel * (maxLevel - 1) / 2,
      s"peak $maxLevel needs >= ${maxLevel * (maxLevel - 1) / 2} pairs, got $nPairs")
  }

  test("point session (single event) is concurrent at exactly its instant") {
    import spark.implicits._
    // synthetic: user 1 at ms=1000 (point), user 2 spanning 500..1500
    val df = Seq((1L, 10L, "a", 1000L), (2L, 20L, "a", 500L), (2L, 21L, "a", 1500L))
      .toDF("user_id", "event_id", "event_type", "ms")
    val iv = df // inline gaps-and-islands over the tiny frame
      .groupBy($"user_id").agg(min($"ms").as("s_ms"), max($"ms").as("e_ms"))
    val a = iv.select($"user_id".as("ua"), $"s_ms".as("sa"), $"e_ms".as("ea"))
    val b = iv.select($"user_id".as("ub"), $"s_ms".as("sb"), $"e_ms".as("eb"))
    val pairs = a.join(b, $"ua" < $"ub" && $"sa" <= $"eb" && $"sb" <= $"ea")
      .count()
    assert(pairs == 1L, "closed-interval semantics must count the point overlap")
  }
}
