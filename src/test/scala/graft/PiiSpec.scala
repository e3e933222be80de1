package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pii

/** PII scrub stage: detection counts follow the deterministic planting
  * rule, and redaction removes every match (no residual PII). */
class PiiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("detection counts match the planting rule per document") {
    val rows = Pii.redact(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(2) == (if (id % 3 != 0) 1L else 0L), s"doc $id emails")
      assert(r.getLong(3) == (if (id % 2 == 0) 1L else 0L), s"doc $id ips")
      assert(r.getLong(4) == 1L, s"doc $id phones")
    }
  }

  test("redacted text has zero residual matches and typed placeholders") {
    val email = Pii.EmailRe.r
    val ip = Pii.IpRe.r
    val phone = Pii.PhoneRe.r
    Pii.redact(spark, sf).collect().foreach { r =>
      val t = r.getString(5)
      assert(email.findFirstIn(t).isEmpty, s"doc ${r.getLong(0)} residual email")
      assert(ip.findFirstIn(t).isEmpty, s"doc ${r.getLong(0)} residual ip")
      assert(phone.findFirstIn(t).isEmpty, s"doc ${r.getLong(0)} residual phone")
      assert(t.contains("[PHONE]"))
      if (r.getLong(2) > 0) assert(t.contains("[EMAIL]"))
      if (r.getLong(3) > 0) assert(t.contains("[IP]"))
    }
  }

  test("per-source rollup is consistent with the per-doc counts") {
    val perDoc = Pii.redact(spark, sf).collect()
      .groupBy(_.getString(1))
      .map { case (src, rs) =>
        src -> (rs.map(_.getLong(2)).sum, rs.map(_.getLong(3)).sum,
                rs.map(_.getLong(4)).sum, rs.length.toLong)
      }
    val rollup = Pii.stats(spark, sf).collect()
    assert(rollup.length == perDoc.size)
    rollup.foreach { r =>
      val (e, i, p, n) = perDoc(r.getString(0))
      assert(r.getLong(1) == e && r.getLong(2) == i && r.getLong(3) == p)
      assert(r.getLong(5) == n)
      assert(r.getLong(4) == n, "every doc carries a planted phone → all have PII")
    }
  }

  test("redaction is a pure map: no shuffle in the per-doc plan") {
    val plan = Pii.redact(spark, sf).queryExecution.executedPlan.toString
    // the only exchange allowed is the final presentation sort's range
    // partitioning; candidate generation itself must not shuffle
    val body = plan.linesIterator.filterNot(_.contains("rangepartitioning")).mkString("\n")
    assert(!body.contains("hashpartitioning"), s"unexpected shuffle:\n$plan")
  }

  test("k-anonymity census matches a driver-side class-size replay") {
    import org.apache.spark.sql.functions._
    val classes = Tables.documents(spark, sf)
      .select(col("lang"), col("source"), expr("n_chars div 100").as("lb"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(identity).view.mapValues(_.length.toLong).values.toSeq
    val total = classes.sum
    val expected = classes.groupBy(sz => sz.toBinaryString.length.toLong)
      .toSeq.sortBy(_._1).map { case (band, szs) =>
        (band, szs.length.toLong, szs.sum, szs.min, szs.max,
         BigInt(szs.sum) * 1000000 / total)
      }
    val got = Pii.kAnonymity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), BigInt(r.getLong(5)))).toSeq
    assert(got == expected, s"kanon mismatch: got=$got exp=$expected")
    // conservation: rows across bands cover the corpus exactly once
    assert(got.map(_._3).sum == total)
    // band envelope: sizes lie inside their power-of-two band
    got.foreach { case (band, _, _, mn, mx, _) =>
      assert(mn >= (1L << (band - 1).toInt) && mx < (1L << band.toInt))
    }
  }
}
