package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EthQueries

/** Round-7 chain-analytics queries (eth_q25–eth_q30) checked against
  * INDEPENDENT driver-side Scala replays: the query runs the distributed
  * plan (histogram read-off windows, ledger unions, co-activity joins);
  * the replay recomputes the same answer with plain collections and
  * BigInt over the engine-scanned rows. Fixture scale (~15k tx) keeps the
  * replay trivial driver-side; the queries themselves never collect. */
class EthAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val dir = graft.sources.eth.EthFixtures.ensure(spark)

  /** (bn, idx, from, to(opt), valueWei, gasLong, gasPriceLong, hash) */
  private lazy val txRows: Seq[(Long, Int, String, Option[String], BigInt, Long, Long, String)] = {
    import spark.implicits._
    spark.read.format("ethereum").option("table", "transaction")
      .option("chain", dir).option("weiDecimal", "true").load()
      .select($"tx_blockNumber", $"tx_transactionIndex", $"tx_from", $"tx_to",
              $"tx_value", $"tx_gas".cast("long"), $"tx_gasPrice".cast("long"), $"tx_hash")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), Option(r.getString(3)),
                 BigInt(r.getDecimal(4).toBigInteger),
                 r.getLong(5), r.getLong(6), r.getString(7))).toSeq
  }

  test("eth_q25 gas market equals a histogram-read-off replay with BigInt fees") {
    val byBucket = txRows.groupBy(_._1 / 1000)
    val expected = byBucket.toSeq.map { case (k, rows) =>
      val gweis = rows.map(_._7 / 1000000000L).sorted
      val n = gweis.size
      def pct(p: Int): Long = {
        val hist = gweis.groupBy(identity).toSeq
          .map { case (g, gs) => (g, gs.size) }.sortBy(_._1)
        var cum = 0L
        var res = Long.MinValue
        hist.foreach { case (g, c) =>
          cum += c
          if (res == Long.MinValue && cum * 100 >= n.toLong * p) res = g
        }
        res
      }
      val fee = rows.map(r => BigInt(r._6) * BigInt(r._7)).sum
      (k, n.toLong, pct(50), pct(90), gweis.max, fee.toString)
    }.sortBy(_._1)
    val got = EthQueries.q25GasMarket(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getString(5))).toSeq
    assert(got == expected, s"gas market mismatch:\n got=$got\n exp=$expected")
  }

  test("eth_q26 cohort retention equals a first-seen/activity-set replay") {
    val ks = txRows.map(r => (r._3, r._1 / 1000))
    val first = ks.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = ks.distinct
      .map { case (a, k) => (first(a), k - first(a)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((c, g), n) => (c, g, n) }.sortBy(t => (t._1, t._2))
    val got = EthQueries.q26AddressCohorts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // every cohort's age-0 row exists: an address is active in its own
    // first bucket by construction
    val cohorts = expected.map(_._1).distinct
    assert(cohorts.forall(c => expected.exists(t => t._1 == c && t._2 == 0L)))
  }

  test("eth_q27 uncle economics equals a per-miner array replay") {
    import spark.implicits._
    val blocks = spark.read.format("ethereum").option("table", "block")
      .option("chain", dir).load()
      .select($"block_miner", size($"block_uncles").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = blocks.groupBy(_._1).toSeq.map { case (m, bs) =>
      val nb = bs.size.toLong
      val nu = bs.map(_._2).sum
      (m, nb, nu, bs.count(_._2 > 0).toLong, nu * 1000000L / nb)
    }.sortBy(t => (-t._2, t._1))
    val got = EthQueries.q27UncleEconomics(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(expected.map(_._3).sum > 0, "fixture must contain uncles")
  }

  test("eth_q28 whale screen equals a signed exact-wei ledger replay") {
    case class Acc(net: BigInt = 0, gross: BigInt = 0, nIn: Long = 0,
                   nOut: Long = 0, peers: Set[String] = Set.empty)
    val m = new scala.collection.mutable.HashMap[String, Acc]().withDefault(_ => Acc())
    txRows.foreach { case (_, _, from, to, wei, _, _, _) =>
      val a = m(from)
      m(from) = a.copy(net = a.net - wei, gross = a.gross + wei, nOut = a.nOut + 1,
        peers = to.fold(a.peers)(a.peers + _))
      to.foreach { t =>
        val b = m(t)
        m(t) = b.copy(net = b.net + wei, gross = b.gross + wei, nIn = b.nIn + 1,
          peers = b.peers + from)
      }
    }
    val expected = m.toSeq
      .map { case (a, acc) => (a, acc.net, acc.gross, acc.nIn, acc.nOut, acc.peers.size.toLong) }
      .sortBy { case (a, net, _, _, _, _) => (-net, a) }.take(20)
      .map { case (a, net, gross, ni, no, np) => (a, net.toString, gross.toString, ni, no, np) }
    val got = EthQueries.q28EthFlow(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
                 r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected, s"whale screen mismatch:\n got=${got.take(3)}\n exp=${expected.take(3)}")
  }

  test("eth_q29 bounce screen equals an in×out co-activity replay") {
    val byBlockAddr = new scala.collection.mutable.HashMap[(Long, String), (Set[String], Set[String])]()
      .withDefault(_ => (Set.empty, Set.empty))
    txRows.foreach { case (bn, _, from, to, _, _, _, h) =>
      val k2 = (bn, from)
      val (i2, o2) = byBlockAddr(k2); byBlockAddr(k2) = (i2, o2 + h)
      to.foreach { t =>
        val k1 = (bn, t)
        val (i1, o1) = byBlockAddr(k1); byBlockAddr(k1) = (i1 + h, o1)
      }
    }
    val perAddr = new scala.collection.mutable.HashMap[String, (Long, Set[Long])]()
      .withDefault(_ => (0L, Set.empty))
    byBlockAddr.foreach { case ((bn, a), (ins, outs)) =>
      val pairs = ins.size.toLong * outs.size - ins.intersect(outs).size
      if (pairs > 0) {
        val (p, bs) = perAddr(a); perAddr(a) = (p + pairs, bs + bn)
      }
    }
    val expected = perAddr.toSeq
      .map { case (a, (p, bs)) => (a, p, bs.size.toLong) }
      .sortBy(t => (-t._2, t._1)).take(20)
    val got = EthQueries.q29BounceScreen(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"bounce mismatch:\n got=${got.take(5)}\n exp=${expected.take(5)}")
    assert(expected.nonEmpty, "fixture must produce same-block bounces")
  }

  test("eth_q31 chain integrity: fixture chain is clean; planted corruption fires") {
    import spark.implicits._
    // the generated chain satisfies td[n]-td[n-1] == diff[n] everywhere
    val rows = EthQueries.q31ChainIntegrity(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) == 0L), s"clean chain reported violations: ${rows.toSeq}")
    // difficulty envelope replay off the engine scan
    val blocks = spark.read.format("ethereum").option("table", "block")
      .option("chain", dir).load()
      .select($"block_number", $"block_difficulty").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val byBucket = blocks.drop(1).groupBy(_._1 / 1000)
    rows.foreach { r =>
      val bs = byBucket(r.getLong(0)).map(_._2)
      assert(r.getLong(1) == bs.length.toLong && r.getLong(3) == bs.min &&
             r.getLong(4) == bs.max && r.getLong(5) == bs.map(BigInt(_)).sum / bs.length)
    }
    // positive control: a 5-block chain with one broken totalDifficulty
    val planted = Seq(
      (0L, 100L, 100L), (1L, 110L, 210L), (2L, 120L, 999L), // td jump ≠ 120
      (3L, 130L, 1129L), (4L, 140L, 1269L))                 // deltas consistent again
      .toDF("block_number", "block_difficulty", "block_totalDifficulty")
    val v = EthQueries.q31ChainIntegrityOf(planted).collect()
    assert(v.length == 1 && v.head.getLong(2) == 1L,
      s"planted corruption not flagged exactly once: ${v.toSeq}")
  }

  test("eth_q32 adoption curve equals a first-seen replay; cum is monotone and totals") {
    import spark.implicits._
    val transfers = spark.read.format("ethereum").option("table", "erc20")
      .option("chain", dir).load()
      .select($"erc20_token", $"erc20_to", $"erc20_blockNumber").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val firstSeen = transfers.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._3).min / 1000).toSeq
    val expected = firstSeen.groupBy { case ((tok, _), k) => (tok, k) }.toSeq
      .map { case ((tok, k), g) => (tok, k, g.size.toLong) }
      .sortBy(t => (t._1, t._2))
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(_._2).scanLeft(("", 0L, 0L, 0L)) { case ((_, _, _, cum), (t, k, n)) =>
          (t, k, n, cum + n)
        }.drop(1)
      }.sortBy(t => (t._1, t._2))
    val got = EthQueries.q32Adoption(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, s"adoption mismatch: got=${got.take(3)} exp=${expected.take(3)}")
    // final cumulative per token = that token's distinct receiver count
    val finals = got.groupBy(_._1).view.mapValues(_.maxBy(_._2)._4).toMap
    val distinctRecv = transfers.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.size.toLong).toMap
    assert(finals == distinctRecv)
  }

  test("eth_q33 selector profile equals a driver-side calldata replay") {
    import spark.implicits._
    val txs = spark.read.format("ethereum").option("table", "transaction")
      .option("chain", dir).load()
      .select($"tx_input", $"tx_to", $"tx_gas".cast("long")).collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2)))
    val expected = txs.groupBy { case (in, _, _) =>
        if (in == "0x") "(transfer)" else in.take(10)
      }.toSeq.map { case (sel, g) =>
        (sel, g.length.toLong, g.flatMap(_._2).distinct.length.toLong,
         g.map(_._3).sum, g.map(t => BigInt(t._3)).sum / g.length)
      }.map { case (s0, n, d0, tg, ag) => (s0, n, d0, tg, ag.toLong) }
      .sortBy(t => (-t._2, t._1))
    val got = EthQueries.q33Selectors(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected, s"selector mismatch: got=$got exp=$expected")
    // the fixture plants the ERC-20 transfer selector and bare transfers
    assert(got.exists(_._1 == "0xa9059cbb") && got.exists(_._1 == "(transfer)"))
  }

  test("eth_q34 value histogram equals a bit-length replay; shares floor-sum to 1e6") {
    val vs = txRows.map(_._5.toLong)
    val expected = vs.groupBy(v => if (v == 0L) 0L else java.lang.Long.toBinaryString(v).length.toLong)
      .toSeq.map { case (bits, g) =>
        (bits, g.size.toLong, g.size.toLong * 1000000L / vs.size)
      }.sortBy(_._1)
    val got = EthQueries.q34ValueHistogram(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"value histogram mismatch: got=${got.take(4)} exp=${expected.take(4)}")
    val shareSum = got.map(_._3).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - got.length)
  }

  test("eth_q30 gas-order audit equals an adjacent-pair replay") {
    val pairs = txRows.groupBy(_._1).toSeq.flatMap { case (bn, rows) =>
      rows.sortBy(_._2).map(_._7).sliding(2).collect {
        case Seq(a, b) => (bn / 1000, b > a)
      }
    }
    val expected = pairs.groupBy(_._1).toSeq.map { case (k, ps) =>
      val n = ps.size.toLong
      val asc = ps.count(_._2).toLong
      (k, n, asc, asc * 1000000L / n)
    }.sortBy(_._1)
    val got = EthQueries.q30GasOrderAudit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }
}
