package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Accuracy bounds for the approximate-aggregation surface (no cross-engine
  * oracle exists for sketches, so the gate is tolerance vs exact). */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact per group") {
    import spark.implicits._
    val approx = Relational.q21ApproxAgg(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag").agg(countDistinct($"l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex <= 0.05, s"$k: approx $ap vs exact $ex")
    }
  }

  test("approx median between group min and max, near exact median") {
    import spark.implicits._
    val approx = Relational.q21ApproxAgg(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex) / ex <= 0.05, s"$k: ${approx(k)} vs $ex")
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
