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

  test("AQE splits a skewed join partition at runtime (skew=true in the plan)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // 90% of the fact rows share one key -> one shuffle partition dwarfs the
    // rest; with aggressive thresholds AQE must mark the SMJ as skew-handled
    val fact = spark.range(0, 60000)
      .select(when($"id" % 10 =!= 0, lit(7L)).otherwise($"id" % 500).as("k"), $"id".as("v"))
    val dim = spark.range(0, 500).select($"id".as("k"), ($"id" * 2).as("w"))
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "20KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.keys.map(k => k -> scala.util.Try(spark.conf.get(k)).toOption).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = fact.join(dim, "k")
      assert(joined.collect().length == 60000) // materialize THIS plan so AQE finalizes it
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(plan.contains("skew=true"), s"AQE did not split the skewed partition:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join equals the direct join") {
    val l = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val direct = l.join(o, l("l_orderkey") === o("o_orderkey")).count()
    val salted = Skew.saltedJoin(l, o, "l_orderkey", "o_orderkey", salts = 5).count()
    assert(salted == direct)
  }

  test("z-order layout clusters the second dimension; single-column sort does not") {
    import spark.implicits._
    // sf0.01 for meaningful spread: partkey 0..1999, suppkey 0..99
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select($"l_partkey", $"l_suppkey", $"l_quantity")
    val nFiles = 16
    val dirX = java.nio.file.Files.createTempDirectory("layout-x").toString
    val dirZ = java.nio.file.Files.createTempDirectory("layout-z").toString
    li.repartitionByRange(nFiles, $"l_partkey")
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(dirX)
    Layout.zorderedWrite(li, "l_partkey", "l_suppkey", dirZ, nFiles)
    def filesWithMatches(dir: String, cond: org.apache.spark.sql.Column): Long =
      spark.read.parquet(dir).filter(cond)
        .select(input_file_name()).distinct().count()
    // a narrow band on the SECOND dimension: the partkey-sorted layout
    // scatters it across ~every file; the Z layout keeps it in a bounded
    // set of boxes (~sqrt of the files)
    val band = $"l_suppkey" >= 10 && $"l_suppkey" <= 14
    val hitX = filesWithMatches(dirX, band)
    val hitZ = filesWithMatches(dirZ, band)
    assert(hitX >= nFiles - 2, s"x-sorted layout unexpectedly clustered suppkey: $hitX")
    assert(hitZ * 2 <= hitX, s"z-order did not cluster suppkey: $hitZ vs $hitX files")
    // the layout changes bytes touched, never results
    val a = spark.read.parquet(dirX).filter(band).agg(
      count(lit(1)), sum($"l_quantity"), sum($"l_partkey")).collect()(0)
    val b = spark.read.parquet(dirZ).filter(band).agg(
      count(lit(1)), sum($"l_quantity"), sum($"l_partkey")).collect()(0)
    assert(a == b, s"layouts disagree: $a vs $b")
    // and the first dimension still prunes too (bounded boxes both ways)
    val pband = $"l_partkey" >= 100 && $"l_partkey" <= 199
    assert(filesWithMatches(dirZ, pband) < nFiles,
      "z layout lost partkey locality entirely")
  }

  /** Round-12 (round-11 review item 7): the documents-side layout pass —
    * z-order the corpus on (source ordinal, quality micro score) and
    * measure files-touched for a QUALITY-BAND scan against the
    * source-sorted layout a mixture-reader write naturally produces.
    * The quality band is the filter every curation pass runs; on the
    * source-sorted layout it scatters across ~every file. */
  test("documents z-ordered on (source, quality) prune a quality-band scan") {
    import spark.implicits._
    import graft.operators.Eval
    val scored = Eval.scoredDocs(spark, "/root/testdata/sf0.1")
      .select(expr("CAST(substr(source, 4) AS BIGINT)").as("src_num"),
              $"score", $"doc_id")
    val nFiles = 64
    val dirS = java.nio.file.Files.createTempDirectory("doclayout-s").toString
    val dirZ = java.nio.file.Files.createTempDirectory("doclayout-z").toString
    // the mixture-reader's natural layout: source-major (doc_id breaks
    // ties so all 64 files fill — there are only ~20 sources)
    scored.repartitionByRange(nFiles, $"src_num", $"doc_id")
      .sortWithinPartitions("src_num", "doc_id")
      .write.mode("overwrite").parquet(dirS)
    Layout.zorderedWrite(scored, "src_num", "score", dirZ, nFiles)
    def filesWithMatches(dir: String, cond: org.apache.spark.sql.Column): Long =
      spark.read.parquet(dir).filter(cond)
        .select(input_file_name()).distinct().count()
    // a quality band around the corpus median score
    val med = scored.stat.approxQuantile("score", Array(0.48, 0.52), 0.005)
    val band = $"score" >= med(0) && $"score" <= med(1)
    val hitS = filesWithMatches(dirS, band)
    val hitZ = filesWithMatches(dirZ, band)
    assert(hitS >= nFiles - 4,
      s"source-sorted layout unexpectedly clustered quality: $hitS")
    assert(hitZ * 2 <= hitS, s"z-order did not cluster quality: $hitZ vs $hitS files")
    // layout never changes answers
    val a = spark.read.parquet(dirS).filter(band)
      .agg(count(lit(1)), sum($"doc_id"), sum($"src_num")).collect()(0)
    val b = spark.read.parquet(dirZ).filter(band)
      .agg(count(lit(1)), sum($"doc_id"), sum($"src_num")).collect()(0)
    assert(a == b, s"layouts disagree: $a vs $b")
    // and the source dimension still prunes (bounded boxes both ways)
    val srcband = $"src_num" >= 3 && $"src_num" <= 5
    assert(filesWithMatches(dirZ, srcband) < nFiles,
      "z layout lost source locality entirely")
  }
}
