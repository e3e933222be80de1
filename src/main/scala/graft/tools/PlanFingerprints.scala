package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, RangePartitioning, SinglePartition}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.execution.window.WindowExec

import graft.SparkEntry

/** Mechanized plan-regression diffing (round-8 review item 7): PLANS.md is
  * prose no gate reads — this tool emits, for EVERY registry query, a
  * CANONICAL PLAN FINGERPRINT (the operator tree with literals and
  * expression ids stripped, keeping the load-bearing shape: exchange
  * partitioning keys, join types/keys, aggregate grouping keys, window
  * partition keys) into a committed `plans_r{N}.json`. The next round
  * diffs its artifact against this one with `tools/check_plans.py` — any
  * query whose shape changed must be explained in that round's notes, and
  * a shape FLIP (a broadcast join becoming a nested loop, a keyed window
  * becoming single-partition) can no longer hide inside 738 KB of prose.
  *
  * Determinism: fingerprints use attribute NAMES, never expr ids, and the
  * AQE wrapper's `initialPlan` (runtime re-planning depends on observed
  * sizes; the initial plan is a pure function of query + conf + stats at
  * the pinned SF). The artifact is sf-pinned — fingerprints from
  * different SFs may legitimately differ (broadcast thresholds).
  *
  * Usage: `runMain graft.tools.PlanFingerprints [sfDir] [outPath]`.
  */
object PlanFingerprints {

  /** Attribute NAMES can themselves embed expr ids: grouping by an
    * unaliased expression makes the partial agg's output attribute named
    * after the pretty SQL string — ids of REFERENCED attributes included
    * as literal text (`CASE WHEN isnull(inv#61208L) ...`), which made one
    * fingerprint JVM-dependent (r12). Strip `#<digits>[L]` textually so
    * the canonical form really is id-free. */
  private def refNames(es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): String =
    es.flatMap(_.references.map(_.name.replaceAll("#[0-9]+L?", "")))
      .sorted.distinct.mkString(",")

  /** Canonical operator-tree string: class name + load-bearing keys. */
  def canonical(p: SparkPlan): String = {
    val node = p match {
      case a: AdaptiveSparkPlanExec => return canonical(a.initialPlan)
      case e: ShuffleExchangeExec => e.outputPartitioning match {
        case h: HashPartitioning => s"Exchange[hash:${refNames(h.expressions)}]"
        case r: RangePartitioning => s"Exchange[range:${refNames(r.ordering)}]"
        case SinglePartition => "Exchange[single]"
        case o => s"Exchange[${o.getClass.getSimpleName}]"
      }
      case j: BaseJoinExec =>
        s"${j.getClass.getSimpleName}[${j.joinType}:${refNames(j.leftKeys ++ j.rightKeys)}]"
      case a: BaseAggregateExec =>
        s"${a.getClass.getSimpleName}[${refNames(a.groupingExpressions)}]"
      case w: WindowExec =>
        s"Window[${refNames(w.partitionSpec)}]"
      case s: org.apache.spark.sql.execution.SortExec =>
        s"Sort[global=${s.global}]"
      case other => other.getClass.getSimpleName
    }
    if (p.children.isEmpty) node
    else s"$node(${p.children.map(canonical).mkString(",")})"
  }

  private def md5(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Minimal JSON string escape — a quote or backslash in an attribute
    * name (refNames output) must not produce an invalid artifact. */
  private def jstr(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '\\' => b.append("\\\\")
      case '"'  => b.append("\\\"")
      case c if c < 0x20 => b.append("\\u%04x".format(c.toInt))
      case c    => b.append(c)
    }
    b.toString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = if (args.length > 1) args(1)
              else sys.env.getOrElse("SPARK_GRAFT_PLANS_OUT", "plans.json")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.eth.EthFixtures.ensure(spark)

    val sb = new StringBuilder("{\n")
    val names = SparkEntry.queries.keys.toSeq.sorted
    var failed = 0
    names.zipWithIndex.foreach { case (name, i) =>
      val entry = try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val tree = canonical(df.queryExecution.executedPlan)
        s"""  "${jstr(name)}": {"fp": "${md5(tree)}", "tree": "${jstr(tree)}"}"""
      } catch {
        case e: Throwable =>
          failed += 1
          System.err.println(s"[plans] $name FAILED: ${e.getMessage}")
          s"""  "$name": {"fp": "ERROR", "tree": "ERROR"}"""
      }
      sb.append(entry).append(if (i == names.length - 1) "\n" else ",\n")
      if ((i + 1) % 25 == 0) System.err.println(s"[plans] ${i + 1}/${names.length}")
    }
    sb.append("}\n")
    Files.write(Paths.get(out), sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"wrote $out (${names.length} fingerprints, $failed failures)")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
