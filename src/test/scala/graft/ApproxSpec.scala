package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Accuracy bounds for the approximate-aggregation surface (no cross-engine
  * oracle exists for sketches, so the gate is tolerance vs exact). */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("q21 sketch verdicts are all true (tolerance holds) and exact counts match") {
    import spark.implicits._
    val rows = Relational.q21ApproxAgg(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (3 to 6).foreach(i => assert(r.getBoolean(i), s"${r.getString(0)} col $i out of tolerance"))
    }
    val exact = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag").agg(countDistinct($"l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == exact(r.getString(0))))
  }

  test("approx_count_distinct within 5% of exact per group") {
    import spark.implicits._
    val both = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey").as("ap"),
           countDistinct($"l_partkey").as("ex"))
      .collect()
    both.foreach { r =>
      val (ap, ex) = (r.getLong(1), r.getLong(2))
      assert(math.abs(ap - ex).toDouble / ex <= 0.05, s"${r.getString(0)}: approx $ap vs exact $ex")
    }
  }

  test("approx median near exact median per group") {
    import spark.implicits._
    val both = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(percentile_approx($"l_extendedprice", lit(0.5), lit(10000)).as("ap"),
           expr("percentile(l_extendedprice, 0.5)").as("ex"))
      .collect()
    both.foreach { r =>
      val (ap, ex) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(ap - ex) / ex <= 0.05, s"${r.getString(0)}: $ap vs $ex")
    }
  }

  test("seeded sample is deterministic and near the requested fraction") {
    val a = Relational.q22Sample(spark, sf).collect().map(_.toSeq)
    val b = Relational.q22Sample(spark, sf).collect().map(_.toSeq)
    assert(a.sameElements(b))
    val total = Tables.lineitem(spark, sf).count()
    val sampled = a.map(_(1).asInstanceOf[Long]).sum
    val frac = sampled.toDouble / total
    assert(frac > 0.07 && frac < 0.13, s"sample fraction $frac")
  }
}
