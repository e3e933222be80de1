package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** In-plan Naive Bayes train/infer/eval (nd_text_nb_classifier): the
  * oracle pins exact micro-nat scores per round; here we pin that the
  * pipeline actually LEARNS (the driver corpus's lang labels carry no
  * textual signal, so that needs a planted corpus) and the scale shape. */
class NbClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("NB learns a planted class-vocabulary split (accuracy ~1.0)") {
    import spark.implicits._
    // two "languages" with disjoint vocabularies + shared filler; 40
    // train + 40 test docs each (even/odd ids interleave the classes)
    val rows = (0 until 160).map { i =>
      val cls = if (i % 4 < 2) "aa" else "bb"
      val word = if (cls == "aa") "alpha" else "bravo"
      val text = (Seq.fill(6)(word) ++ Seq("common", "filler")).mkString(" ")
      (i.toLong, text, cls, "srcX", text.length.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("nbplant").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.nbClassify(spark, dir).collect()
    assert(out.length == 80, s"expected 80 test docs, got ${out.length}")
    val acc = out.count(_.getBoolean(3)).toDouble / out.length
    assert(acc == 1.0, s"planted accuracy $acc != 1.0")
  }

  test("NB plan shape: broadcast model lookup, per-doc argmax partitions") {
    val (df, free) = TextAnalysis.nbClassifyLazy(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    free()
    assert(plan.contains("BroadcastHashJoin"),
      s"model lookup lost its broadcast:\n$plan")
    assert(plan.contains("hashpartitioning(doc_id"),
      s"argmax not per-doc partitioned:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"classifier funnels:\n$plan")
  }
}
