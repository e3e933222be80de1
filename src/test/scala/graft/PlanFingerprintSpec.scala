package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.PlanFingerprints

/** The committed plan-fingerprint artifact (`plans_r{N}.json`, written by
  * [[graft.tools.PlanFingerprints]]) is only a gate if something DIFFS
  * it. `tools/check_plans.py` does so across rounds; this spec does so
  * inside `sbt test`: every registry query's LIVE canonical fingerprint
  * at sf0.01 must equal the committed one. A shape change is legitimate
  * exactly when the artifact is regenerated in the same change that
  * causes it — then this spec sees the new artifact and passes; an
  * accidental plan flip (a lost broadcast hint, a window losing its
  * partition keys) fails here before any reviewer reads a plan dump.
  *
  * Fingerprints are deterministic across JVMs (attribute names only, no
  * expr ids; AQE initialPlan) — verified by regenerating the round-9
  * artifact in two independent processes.
  */
class PlanFingerprintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private val artifact = "plans_r15.json"

  test(s"live plan fingerprints match the committed $artifact") {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(artifact)),
      java.nio.charset.StandardCharsets.UTF_8)
    // one entry per line: "name": {"fp": "...", "tree": "..."}
    val committed = """"([A-Za-z0-9_]+)": \{"fp": "([0-9a-f]+|ERROR)"""".r
      .findAllMatchIn(text).map(m => m.group(1) -> m.group(2)).toMap
    assert(committed.size == SparkEntry.queries.size,
      s"artifact has ${committed.size} entries, registry has " +
      s"${SparkEntry.queries.size} — regenerate $artifact " +
      "(runMain graft.tools.PlanFingerprints /root/testdata/sf0.01 " + artifact + ")")
    val drifted = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val tree = PlanFingerprints.canonical(
        fn(spark, sf).queryExecution.executedPlan)
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(tree.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      if (!committed.get(name).contains(fp))
        drifted += s"$name\n  live: $tree"
    }
    assert(drifted.isEmpty,
      s"plan shapes drifted from $artifact (regenerate it if intended):\n" +
      drifted.mkString("\n"))
  }
}
