package graft

import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide scale audit: no query in `SparkEntry.queries` may plan a
  * DATA-SCALE operator over a single-partition funnel.
  *
  * The rule: a `Window` or global `Sort` directly consuming an
  * `Exchange SinglePartition` pulls every row through one task — the
  * first thing to fall over at 100 TB. Global *aggregates* over a
  * SinglePartition exchange are fine (the exchange carries partial-agg
  * states, rows = partition count), as are `TakeOrderedAndProject` top-k
  * plans — so the audit checks the specific operator-over-exchange
  * adjacency in the plan tree, not string presence.
  *
  * Whitelisted: the two reference-parity queries that deliberately keep
  * the literal `ntile OVER (ORDER BY ...)` window form (each has a
  * hash-identical scale twin via ScalableNtile, plan-asserted elsewhere).
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  /** Reference-parity literal global windows; scale twins: q35 / eth_q10. */
  private val allowedLiteralWindows = Set("q05_ntile_buckets", "eth_q2_ntile_gas")

  private def isSinglePartitionExchange(p: SparkPlan): Boolean = p match {
    case e: ShuffleExchangeExec => e.outputPartitioning.numPartitions == 1
    case _ => false
  }

  /** (operator, child-exchange) offenders in the plan tree. */
  private def funnels(plan: SparkPlan): Seq[String] = {
    val unwrapped = plan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    unwrapped.collect {
      case w: WindowExec if w.children.exists(c =>
            c.collectFirst { case e if isSinglePartitionExchange(e) => e }.isDefined &&
            // only flag when the exchange feeds the window without an
            // intervening aggregate (aggregates shrink to state-scale)
            !c.collectFirst { case agg: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => agg }.isDefined) =>
        s"Window over SinglePartition: ${w.simpleStringWithNodeId()}"
      case s: SortExec if s.global &&
            s.children.exists(isSinglePartitionExchange) =>
        s"global Sort over SinglePartition: ${s.simpleStringWithNodeId()}"
    }
  }

  /** Round-9 detector: a `Window` over RAW ROWS whose partition keys are
    * all drawn from known bounded-cardinality columns caps parallelism at
    * |key values| and sorts one key's entire timeline in one task — the
    * hot-partition shape `Exchange SinglePartition` checks cannot see
    * (the round-8 moving-median finding existed for a full round with the
    * funnel gate green). An aggregate anywhere below the window shrinks
    * the partition to state scale, so those pass; a high-cardinality
    * column among the keys restores parallelism, so those pass too. */
  private val boundedCardinalityCols =
    Set("event_type", "source", "lang", "label", "token", "erc20_token")

  private def hotKeyWindows(plan: SparkPlan): Seq[String] = {
    val unwrapped = plan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    unwrapped.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.nonEmpty &&
             w.partitionSpec.forall(_.references.forall(a =>
               boundedCardinalityCols.contains(a.name))) &&
             !w.children.exists(_.collectFirst {
               case agg: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => agg
             }.isDefined) =>
        s"Window over raw rows keyed only by bounded-cardinality " +
          s"columns: ${w.simpleStringWithNodeId()}"
    }
  }

  /** Literal trailing-window form kept for oracle parity; scale twin:
    * nd_events_moving_median_scalable (chunked, bit-identical). */
  private val allowedHotKeyWindows = Set("nd_events_moving_median")

  test("detector positive control: the literal moving-median window IS a hot-key window") {
    val mm = SparkEntry.queries("nd_events_moving_median")(spark, sf)
    assert(hotKeyWindows(mm.queryExecution.executedPlan).nonEmpty,
      "the audit failed to flag the known per-event_type raw-row window — detector broken")
    // and the chunked scale twin passes: its keys include the chunk id
    val mmc = SparkEntry.queries("nd_events_moving_median_scalable")(spark, sf)
    assert(hotKeyWindows(mmc.queryExecution.executedPlan).isEmpty,
      "the chunked scale path must not trip the hot-key detector")
  }

  test("no raw-row Window keyed only by bounded-cardinality columns in any registry query") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!allowedHotKeyWindows.contains(name)) {
        val df = fn(spark, sf)
        val bad = hotKeyWindows(df.queryExecution.executedPlan)
        if (bad.nonEmpty) offenders += s"$name -> ${bad.mkString("; ")}"
      }
    }
    assert(offenders.isEmpty, s"hot-key windows over raw rows:\n${offenders.mkString("\n")}")
  }

  test("detector positive control: the literal global-ntile window IS a funnel") {
    val q05 = SparkEntry.queries("q05_ntile_buckets")(spark, sf)
    assert(funnels(q05.queryExecution.executedPlan).nonEmpty,
      "the audit failed to flag the known single-partition window — detector broken")
  }

  test("no data-scale Window/Sort funnels through a single partition in any registry query") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!allowedLiteralWindows.contains(name)) {
        val df = fn(spark, sf)
        val bad = funnels(df.queryExecution.executedPlan)
        if (bad.nonEmpty) offenders += s"$name -> ${bad.mkString("; ")}"
      }
    }
    assert(offenders.isEmpty, s"single-partition funnels:\n${offenders.mkString("\n")}")
  }

  /** Round-8 payload discipline: LSH candidate-generation shuffles must
    * move keys, not payloads — the band/bucket exchange carrying each
    * side's signature or embedding was ~48 GB of shuffle at the 10M-doc
    * DedupScale run. This pins it mechanically: every exchange whose
    * partitioning keys include the candidate bucket must NOT output the
    * wide column (sig / v). */
  private def shuffles(plan: SparkPlan): Seq[ShuffleExchangeExec] = {
    val unwrapped = plan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    unwrapped.collect { case e: ShuffleExchangeExec => e }
  }

  /** True iff the exchange hash-partitions on an attribute named exactly
    * `keyCol` (substring matching is unsafe for one-letter keys like the
    * setsim signature's `x`/`y`). */
  private def partitionsOn(e: ShuffleExchangeExec, keyCol: String): Boolean =
    e.outputPartitioning match {
      case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
        h.expressions.exists(_.references.exists(_.name == keyCol))
      case _ => false
    }

  test("candidate-generation shuffles carry no signature/vector/set payload") {
    import graft.operators.{Dedup, Similarity}
    // at oracle SF the band join broadcasts its (small) build side and no
    // shuffle exists; disable broadcast to plan the shape a corpus-scale
    // run takes — sort-merge with both sides exchanged on the bucket key
    val big = spark.newSession()
    big.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val cases: Seq[(String, org.apache.spark.sql.DataFrame, String, String)] = Seq(
      ("minhashPairs", Dedup.minhashPairs(big, sf), "band", "sig"),
      ("embeddingPairs", Dedup.embeddingPairs(big, sf), "bucket", "v"),
      // round-9: the AllPairs/PPJoin signature self-join joins on (x, y)
      // and must not drag the full token array `ws` through the exchange
      ("setSimJoin", Similarity.setSimJoin(big, sf), "x", "ws"),
      // round-9: the containment inverted-index join on the shingle hash
      // must not carry the shingle-set array (pre-materialization plan —
      // the registry entry detaches)
      ("containmentPairs",
        Dedup.containmentPairsLazy(graft.Tables.documents(big, sf))._1, "h", "sh"))
    cases.foreach { case (name, df, keyCol, payloadCol) =>
      val candidateShuffles = shuffles(df.queryExecution.executedPlan)
        .filter(partitionsOn(_, keyCol))
      assert(candidateShuffles.nonEmpty,
        s"$name: no $keyCol-keyed exchange found — detector looking at the wrong plan")
      candidateShuffles.foreach { e =>
        assert(!e.output.exists(_.name == payloadCol),
          s"$name: the $keyCol-keyed candidate exchange carries '$payloadCol' — " +
          s"payload through the candidate shuffle:\n$e")
      }
    }
  }

  /** Round-12 representation guard: the driver's comparator reads Spark
    * parquet with one reader and DuckDB output with another; a DECIMAL
    * whose values can exceed 2^63 renders as exact Decimal on one side
    * and float64 `2.45e+22` on the other (the nd_eval_regression r11
    * hash-red). Rule: no registry OUTPUT schema may carry a DecimalType
    * with more than 18 integer digits — pin such values as STRING (the
    * eth_q12_wei_decimal precedent) or split into BIGINT halves. */
  test("no registry output schema carries a DECIMAL that can exceed 2^63") {
    import org.apache.spark.sql.types._
    def wide(dt: DataType): Boolean = dt match {
      case d: DecimalType => d.precision - d.scale > 18
      case ArrayType(e, _) => wide(e)
      case MapType(k, v, _) => wide(k) || wide(v)
      case StructType(fs) => fs.exists(f => wide(f.dataType))
      case _ => false
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      fn(spark, sf).schema.fields.filter(f => wide(f.dataType))
        .map(f => s"$name.${f.name}: ${f.dataType.sql}")
    }
    assert(offenders.isEmpty,
      s"DECIMAL outputs that can exceed 2^63 (pin as STRING):\n${offenders.mkString("\n")}")
  }
}
