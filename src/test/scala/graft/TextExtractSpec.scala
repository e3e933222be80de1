package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** HTML→text extraction ([[TextAnalysis.htmlExtract]]): plan shape (pure
  * map — the lines never become rows) and a driver-side replay of the
  * whole strip→decode→boilerplate-filter chain on real corpus docs. */
class TextExtractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("extraction is a pure map: no shuffle in the per-doc plan") {
    val plan = TextAnalysis.htmlExtract(spark, sf)
      .queryExecution.executedPlan.toString
    // the only exchange allowed is the final presentation sort's range
    // partitioning (the Pii.redact discipline)
    val body = plan.linesIterator.filterNot(_.contains("rangepartitioning")).mkString("\n")
    assert(!body.contains("hashpartitioning"), s"unexpected shuffle:\n$plan")
  }

  test("strip→decode→filter chain matches a driver-side replay") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).take(50)
    val expected = docs.map { case (id, src, text) =>
      val half = text.length / 2
      val page = s"<html><head><title>$src &amp; co</title></head>\n" +
        "<body>\n<nav>Home | About | Sign in</nav>\n" +
        s"<h1>Document $id</h1>\n" +
        s"<p>${text.substring(0, half)}</p>\n" +
        s"<p>${text.substring(half)}</p>\n" +
        (if (id % 2 == 0) "<div class=\"ad\">Sponsored: best deals here</div>\n" else "") +
        s"<footer>(c) $src all rights reserved</footer>\n</body></html>"
      val nTags = "<[^>]*>".r.findAllIn(page).length.toLong
      val stripped = page.replaceAll("<[^>]*>", "").replace("&amp;", "&")
      val lines = stripped.split("\n", -1).map(_.trim).filter(_.nonEmpty)
      val kept = lines.filter(_.split(" +", -1).length >= 10)
      (id, src, nTags, lines.length.toLong, kept.length.toLong,
       kept.mkString("\n"), kept.mkString("\n").length.toLong)
    }.toSeq
    val got = TextAnalysis.htmlExtract(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getString(5), r.getLong(6)))
      .toSeq.take(50)
    assert(got == expected, {
      val d = got.zip(expected).find { case (g, e) => g != e }
      s"first divergence: $d"
    })
    // the boilerplate filter actually separates: some doc keeps its
    // paragraphs while every doc drops nav/title/footer lines
    assert(expected.exists(_._5 > 0), "no doc kept any prose line")
    assert(expected.forall(e => e._5 < e._4), "nothing was ever dropped")
  }
}
