package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.plans.Layout

/** Scale-path utilities: bucketed co-located joins and salted skew
  * handling — equality with the naive plan plus plan-shape assertions. */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed join runs without a shuffle exchange") {
    val l = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val joined = Layout.colocatedJoin(spark, l, o, "l_orderkey", "o_orderkey", buckets = 8)
    // disable auto-broadcast so the assertion is about bucketing, not size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // correctness: same row count as the plain join
      assert(joined.count() ==
        l.join(o, l("l_orderkey") === o("o_orderkey")).count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("salted aggregation equals the direct aggregation") {
    import spark.implicits._
    val df = Tables.lineitem(spark, sf)
    val direct = df.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"),
           min($"l_extendedprice").as("mn"), max($"l_extendedprice").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val salted = Skew.saltedAgg(df, Seq("l_returnflag"), salts = 7,
      ("count", "l_orderkey", "n"), ("sum", "l_quantity", "q"),
      ("min", "l_extendedprice", "mn"), ("max", "l_extendedprice", "mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(salted.keySet == direct.keySet)
    direct.foreach { case (k, (n, q, mn, mx)) =>
      val (n2, q2, mn2, mx2) = salted(k)
      assert(n2 == n && math.abs(q2 - q) < 1e-6 && mn2 == mn && mx2 == mx, s"group $k")
    }
  }

  test("salted join equals the direct join") {
    val l = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val direct = l.join(o, l("l_orderkey") === o("o_orderkey")).count()
    val salted = Skew.saltedJoin(l, o, "l_orderkey", "o_orderkey", salts = 5).count()
    assert(salted == direct)
  }
}
