package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.eth.EthFixtures

/** The fixture chain must regenerate byte-identically: the oracle parquet
  * on disk and the JSONL the engine reads are only a valid differential
  * pair if a clean-tree regeneration (e.g. a fresh checkout) reproduces
  * exactly the same chain. */
class FixtureDeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("chain fixture regenerates byte-identically") {
    val existing = EthFixtures.ensure(spark)
    val fresh = Files.createTempDirectory("ethregen").toString
    EthFixtures.ensure(spark, fresh)
    for (rel <- Seq("hash-index.txt", "meta.txt", "chain/blocks-0000001.jsonl",
                    "chain/blocks-0005121.jsonl")) {
      val a = Files.readAllBytes(Paths.get(existing, rel))
      val b = Files.readAllBytes(Paths.get(fresh, rel))
      assert(java.util.Arrays.equals(a, b), s"$rel differs on regeneration")
    }
    // expected parquet content (not bytes — file layout may differ): compare rows
    for (t <- Seq("block", "transaction", "erc20")) {
      val a = spark.read.parquet(s"$existing/expected/$t")
      val b = spark.read.parquet(s"$fresh/expected/$t")
      assert(a.count() == b.count(), s"$t row count differs")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, s"$t rows differ")
    }
  }
}
