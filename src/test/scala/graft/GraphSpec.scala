package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EthQueries, Relational}

/** Transfer-graph analytics (eth_q16/eth_q17) and the exact scalable
  * percentile (q46) — each checked against an INDEPENDENT formulation:
  * PageRank against a driver-side Scala reimplementation of the integer
  * recurrence, the percentile against the literal single-sort window the
  * scalable plan refuses to run at data scale.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("eth_q20 balances equal a driver-side signed exact-wei ledger replay") {
    import spark.implicits._
    val dir = graft.sources.eth.EthFixtures.ensure(spark)
    val transfers = spark.read.format("ethereum")
      .option("table", "erc20").option("chain", dir)
      .option("weiDecimal", "true").load()
      .select($"erc20_token", $"erc20_from", $"erc20_to", $"erc20_value")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
                 BigInt(r.getDecimal(3).toBigInteger)))
    val bal = new scala.collection.mutable.HashMap[(String, String), (BigInt, Long, Long)]()
    transfers.foreach { case (tok, from, to, wei) =>
      val (bc, ni, no) = bal.getOrElse((tok, to), (BigInt(0), 0L, 0L))
      bal((tok, to)) = (bc + wei, ni + 1, no)
      val (bc2, ni2, no2) = bal.getOrElse((tok, from), (BigInt(0), 0L, 0L))
      bal((tok, from)) = (bc2 - wei, ni2, no2 + 1)
    }
    // conservation: the ledger sums to zero over all holders
    assert(bal.values.map(_._1).sum == BigInt(0), "signed ledger must conserve")
    val expected = bal.toSeq
      .map { case ((t, a), (b, ni, no)) => (t, a, b.toString, ni, no) }
      .sortBy { case (t, a, b, _, _) => (-BigInt(b), t, a) }.take(15)
    val got = EthQueries.q20Balances(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
                 r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected, s"balances mismatch:\n got=${got.take(3)}\n exp=${expected.take(3)}")
  }

  test("eth_q17 pagerank equals a driver-side integer-exact reimplementation") {
    import spark.implicits._
    val dir = graft.sources.eth.EthFixtures.ensure(spark)
    val edges = spark.read.format("ethereum")
      .option("table", "erc20").option("chain", dir).load()
      .groupBy($"erc20_from", $"erc20_to").agg(count(lit(1)).as("w"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5) {
      // BigInt mirrors the query's DECIMAL(38,0)-widened products
      val in = new scala.collection.mutable.HashMap[String, Long]().withDefaultValue(0L)
      edges.foreach { case (s, d, w) =>
        in(d) += (BigInt(rank(s)) * w / outw(s)).toLong
      }
      rank = nodes.map(n => n -> (150000L + (BigInt(850) * in(n) / 1000).toLong)).toMap
    }
    val expected = rank.toSeq.sortBy { case (a, r) => (-r, a) }.take(15)
    val got = EthQueries.q17PageRank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected, s"pagerank mismatch:\n got=$got\n exp=$expected")
  }

  test("eth_q17 ranks conserve (leaky) mass and respect the teleport floor") {
    val rows = EthQueries.q17PageRank(spark, sf).collect()
    assert(rows.length == 15)
    assert(rows.forall(_.getLong(1) >= 150000L), "rank below teleport floor")
    // top-15 of a 200-node graph can't hold more than the full graph mass
    assert(rows.map(_.getLong(1)).sum <= 200L * 1000000L)
  }

  test("eth_q16 degree profile is consistent with raw transfer counts") {
    import spark.implicits._
    val dir = graft.sources.eth.EthFixtures.ensure(spark)
    val raw = spark.read.format("ethereum")
      .option("table", "erc20").option("chain", dir).load()
    val total = raw.count()
    val rows = EthQueries.q16TokenGraph(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == total, "per-token transfers don't sum to total")
    rows.foreach { r =>
      val (n, senders, receivers, pairs) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(senders <= n && receivers <= n && pairs <= n)
      assert(pairs >= math.max(senders, receivers),
        "distinct edges can't be fewer than distinct endpoints on either side")
    }
  }

  test("eth_q18 triangle count equals a driver-side adjacency-set recount") {
    import spark.implicits._
    val dir = graft.sources.eth.EthFixtures.ensure(spark)
    val edges = spark.read.format("ethereum")
      .option("table", "erc20").option("chain", dir).load()
      .select(least($"erc20_from", $"erc20_to").as("a"),
              greatest($"erc20_from", $"erc20_to").as("b"))
      .filter($"a" =!= $"b").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // count each triangle once at its lexicographically-smallest vertex
    val expected = edges.map { case (a, b) =>
      adj(a).count(c => c > a && c > b && adj(b).contains(c)).toLong
    }.sum
    val row = EthQueries.q18Triangles(spark, sf).collect().head
    assert(row.getLong(0).toInt == adj.size, "node count")
    assert(row.getLong(1).toInt == edges.length, "edge count")
    assert(row.getLong(3) == expected,
      s"triangles: got ${row.getLong(3)}, brute force $expected")
  }

  test("eth_q35 jaccard histogram equals a brute per-edge set-intersection replay") {
    import spark.implicits._
    val dir = graft.sources.eth.EthFixtures.ensure(spark)
    val edges = spark.read.format("ethereum")
      .option("table", "erc20").option("chain", dir).load()
      .select(least($"erc20_from", $"erc20_to").as("a"),
              greatest($"erc20_from", $"erc20_to").as("b"))
      .filter($"a" =!= $"b").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // the definition the operator refuses to run at scale: per edge,
    // intersect the two neighbor sets directly
    val perEdge = edges.map { case (a, b) =>
      val common = (adj(a) intersect adj(b)).size.toLong
      val denom = adj(a).size + adj(b).size - common
      (common, BigInt(common) * 1000000 / denom)
    }
    val expected = perEdge.groupBy(_._2.toLong / 100000).toSeq.sortBy(_._1)
      .map { case (bucket, rows) =>
        (bucket, rows.length.toLong, rows.map(_._1).sum,
         rows.map(_._2.toLong).max)
      }
    val got = EthQueries.q35NeighborJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected,
      s"jaccard histogram mismatch: got=$got exp=$expected")
    // conservation: bucket sizes sum to the edge count; every common
    // neighbor is one triangle corner-pair, so Σcommon = 3·triangles
    assert(got.map(_._2).sum == edges.length.toLong)
    val tri = EthQueries.q18Triangles(spark, sf).collect().head.getLong(3)
    assert(got.map(_._3).sum == 3 * tri, "sum(common) must equal 3x triangles")
  }

  test("eth_q19 components equal a driver-side union-find (convergence-guarded)") {
    import spark.implicits._
    val dir = graft.sources.eth.EthFixtures.ensure(spark)
    val edges = spark.read.format("ethereum")
      .option("table", "erc20").option("chain", dir).load()
      .select($"erc20_token", least($"erc20_from", $"erc20_to").as("a"),
              greatest($"erc20_from", $"erc20_to").as("b"))
      .filter($"a" =!= $"b").distinct()
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // union-find per token → TRUE components, independent of iteration count
    val expected = edges.groupBy(_._1).map { case (tok, es) =>
      val parent = scala.collection.mutable.HashMap[String, String]()
      def find(x: String): String = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (_, a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.Ordering[String].max(ra, rb)) = math.Ordering[String].min(ra, rb)
      }
      val sizes = parent.keys.toSeq.groupBy(find).values.map(_.size.toLong).toSeq
      tok -> (sizes.sum, sizes.size.toLong, sizes.max, sizes.min)
    }
    val got = EthQueries.q19Components(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == expected.toMap,
      "label propagation disagrees with union-find — not converged or wrong")
  }

  test("star contraction merges a deep path in LOG rounds, not diameter rounds") {
    import spark.implicits._
    // 4096-node path p0001–…–p4096: diameter 4095. The replaced min-label
    // loop needed 4095 changing rounds here; alternating large-star/
    // small-star must close it within 2·log₂(n) = 24 — the round-11
    // log-round contract (GraphScale re-proves it at 1M nodes).
    val n = 4096
    val addrs = (1 to n).map(i => f"p$i%04d")
    val edges = addrs.sliding(2).map { case Seq(a, b) => ("t", a, b) }.toSeq
    val sym = edges.toDF("token", "u", "v")
      .union(edges.map { case (t, a, b) => (t, b, a) }.toDF("token", "u", "v"))
    val nodes = addrs.map(a => ("t", a)).toDF("token", "addr")
    val (lblFull, rounds) = EthQueries.starComponents(sym, nodes)
    val labels = lblFull.select("lbl").distinct().collect().map(_.getString(0))
    assert(labels.toSeq == Seq("p0001"),
      s"expected single component p0001, got ${labels.take(5).toSeq}…")
    assert(lblFull.count() == n.toLong, "every node must carry a label")
    val bound = 2 * (math.log(n.toDouble) / math.log(2.0)).ceil.toInt
    assert(rounds <= bound,
      s"star contraction took $rounds rounds on a $n-node path; log-round bound is $bound")
    // fail-loud cap contract: an unconverged exit THROWS, never returns
    // partial labels (the round-10 verdict's silent-cap failure mode)
    intercept[IllegalStateException] {
      EthQueries.starComponents(sym, nodes, maxRounds = 0)
    }
  }

  test("star contraction handles multi-component graphs, isolated nodes, self-loop-free input") {
    import spark.implicits._
    // two components per token + an isolated node; labels must be the
    // component minimum, isolated nodes label themselves
    val edges = Seq(
      ("t", "a", "b"), ("t", "b", "c"),          // {a,b,c} → a
      ("t", "x", "y"),                           // {x,y}   → x
      ("u", "b", "q"))                           // token-partitioned: u's graph separate
    val sym = edges.toDF("token", "u", "v")
      .union(edges.map { case (t, a, b) => (t, b, a) }.toDF("token", "u", "v"))
    val nodes = (edges.flatMap { case (t, a, b) => Seq((t, a), (t, b)) } :+ (("t", "zz")))
      .distinct.toDF("token", "addr")
    val (lbl, _) = EthQueries.starComponents(sym, nodes)
    val got = lbl.collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(got(("t", "a")) == "a" && got(("t", "b")) == "a" && got(("t", "c")) == "a")
    assert(got(("t", "x")) == "x" && got(("t", "y")) == "x")
    assert(got(("t", "zz")) == "zz", "isolated node must label itself")
    assert(got(("u", "b")) == "b" && got(("u", "q")) == "b",
      "token u's component must not leak token t's labels")
  }

  test("hybrid componentsLazy: driver union-find and star contraction emit identical labels") {
    import spark.implicits._
    // random-ish multi-component graph over string addresses (the eth
    // shape) — seeded arithmetic, no RNG object
    val edges = (0 until 400).map { i =>
      val a = f"n${(i * 131) % 97}%03d"; val b = f"n${(i * 17 + 5) % 97}%03d"
      ("t", if (a < b) a else b, if (a < b) b else a)
    }.filter(e => e._2 != e._3).distinct
    val sym = edges.toDF("token", "u", "v")
      .union(edges.map { case (t, a, b) => (t, b, a) }.toDF("token", "u", "v"))
    val nodes = (edges.flatMap { case (t, a, b) => Seq((t, a), (t, b)) } :+ (("t", "zzz")))
      .distinct.toDF("token", "addr")
    val (drv, drvRounds, freeD) = graft.operators.Graph.componentsLazy(sym, nodes)
    assert(drvRounds == 0, "metadata-scale graph must take the driver path")
    val (star, starRounds, freeS) =
      graft.operators.Graph.componentsLazy(sym, nodes, driverThreshold = 0L)
    assert(starRounds > 0, "threshold 0 must force the distributed star path")
    val a = drv.orderBy("token", "addr").collect().toSeq
    val b = star.orderBy("token", "addr").collect().toSeq
    assert(a == b, "hybrid paths disagree on component labels")
    freeD(); freeS()
  }

  test("reliable-checkpoint mode (spark.graft.checkpointDir) yields identical results") {
    import spark.implicits._
    val addrs = (1 to 12).map(i => f"b$i%02d")
    val edges = addrs.sliding(2).map { case Seq(a, b) => ("t", a, b) }.toSeq
    val sym = edges.toDF("token", "u", "v")
      .union(edges.map { case (t, a, b) => (t, b, a) }.toDF("token", "u", "v"))
    val nodes = addrs.map(a => ("t", a)).toDF("token", "addr")
    val (defaultLbl, defaultRounds) = EthQueries.starComponents(sym, nodes)
    val ckDir = java.nio.file.Files.createTempDirectory("graft-ck").toString
    spark.conf.set("spark.graft.checkpointDir", ckDir)
    try {
      val (reliableLbl, reliableRounds) = EthQueries.starComponents(sym, nodes)
      assert(reliableRounds == defaultRounds)
      val a = defaultLbl.orderBy("token", "addr").collect().toSeq
      val b = reliableLbl.orderBy("token", "addr").collect().toSeq
      assert(a == b, "reliable-checkpoint mode changed the converged labels")
      // the reliable mode actually wrote through the configured dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, "no checkpoint files written under spark.graft.checkpointDir")
    } finally {
      spark.conf.unset("spark.graft.checkpointDir")
    }
  }

  test("length outlier screen fires on planted absurd lengths, stays quiet on uniform") {
    import spark.implicits._
    // 40 uniform lengths plus one absurd high and one absurd low
    val uniform = (1 to 40).map(i => ("s", 1000L + i))
    val planted = uniform ++ Seq(("s", 1000000L), ("s", 1L), ("t", 500L), ("t", 510L))
    val out = graft.operators.TextAnalysis.lengthOutliersFrom(
        planted.toDF("source", "n_chars")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("s").getLong(3) == 1, "planted high outlier not flagged")
    assert(out("s").getLong(4) == 1, "planted low outlier not flagged")
    // two near-identical lengths: nothing beyond even 1 sigma... except
    // that for n=2 every point sits at exactly 1 sigma, not beyond
    assert(out("t").getLong(3) == 0 && out("t").getLong(4) == 0)
    val quiet = graft.operators.TextAnalysis.lengthOutliersFrom(
        uniform.toDF("source", "n_chars")).collect().head
    assert(quiet.getLong(3) == 0 && quiet.getLong(4) == 0,
      "uniform lengths must not exceed the 3-sigma screen")
    assert(quiet.getLong(1) > 0, "z1 tier should discriminate on uniform data")
  }

  test("q46 exact percentile equals the literal single-sort formulation") {
    import spark.implicits._
    val got = Relational.q46ExactPercentile(spark, sf).collect().head
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(graft.operators.Money.cents($"l_extendedprice").as("cents"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"cents")
    val ranked = li
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    def at(q: Double): Long = ranked
      .filter($"rnk" >= ceil(lit(q) * $"n").cast("long"))
      .agg(min($"cents")).collect().head.getLong(0)
    assert(got.getLong(1) == at(0.25))
    assert(got.getLong(2) == at(0.5))
    assert(got.getLong(3) == at(0.95))
    // mirror the query's exact decimal→double path (a plain double
    // multiply by the unrepresentable 0.01 can differ by 1 ulp)
    assert(got.getDouble(4) == new java.math.BigDecimal(at(0.5))
      .multiply(new java.math.BigDecimal("0.01")).doubleValue)
  }

  test("q47 regression equals a driver-side BigInt-moment recompute") {
    import spark.implicits._
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_returnflag", graft.operators.Money.cents($"l_quantity").as("x"),
              graft.operators.Money.cents($"l_extendedprice").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = Relational.q47Linreg(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    rows.groupBy(_._1).foreach { case (flag, g) =>
      val n = BigInt(g.length)
      val sx = g.map(t => BigInt(t._2)).sum; val sy = g.map(t => BigInt(t._3)).sum
      val sxy = g.map(t => BigInt(t._2) * t._3).sum
      val sxx = g.map(t => BigInt(t._2) * t._2).sum
      val syy = g.map(t => BigInt(t._3) * t._3).sum
      def rnd6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val num = (n * sxy - sx * sy).toDouble
      val r = got(flag)
      assert(r.getLong(1) == g.length)
      assert(r.getDouble(2) == rnd6((n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble))
      assert(r.getDouble(4) == rnd6(num * num /
        ((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)))
      // r² is a ratio of a square to a positive product
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1)
    }
  }

  test("q48 histogram bins cover every order exactly once, cumulative is total") {
    import spark.implicits._
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    val rows = Relational.q48Histogram(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == total, "bin counts don't sum to row count")
    assert(rows.last.getLong(4) == total, "cumulative ends below total")
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 15))
    assert(rows.forall(r => r.getLong(2) <= r.getLong(3)), "lo > hi inside a bin")
    // bin value ranges are disjoint and ordered
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) < b.getLong(2))
      case _ =>
    }
  }

  test("taint BFS reaches the far end of a long chain and nothing across components") {
    import spark.implicits._
    // 16-node directed path s -> n01 -> ... -> n15 (needs 15 expansion
    // rounds — any fixed small hop budget would silently under-taint),
    // plus a disconnected edge x -> y that must stay clean, plus a cycle
    // c1 -> c2 -> c3 -> c1 that must not loop the guard forever
    val path = ("s" +: (1 to 15).map(i => f"n$i%02d")).sliding(2)
      .map { case Seq(a, b) => ("t", a, b) }.toSeq
    val edges = (path ++ Seq(("t", "x", "y"),
        ("t", "c1", "c2"), ("t", "c2", "c3"), ("t", "c3", "c1")))
      .toDF("token", "src", "dst")
    val seeds = Seq(("t", "s"), ("t", "c1")).toDF("token", "addr")
    val reached = EthQueries.reachFrom(edges, seeds)
      .collect().map(_.getString(1)).toSet
    assert(reached == (Set("s", "c1", "c2", "c3") ++ (1 to 15).map(i => f"n$i%02d")),
      s"unexpected taint set: $reached")
    assert(!reached("x") && !reached("y"), "taint crossed into a disconnected component")
  }

  test("eth_q23 concentration statistics match a driver-side BigInt replay") {
    import spark.implicits._
    val rows = EthQueries.q23Gini(spark, sf).collect()
    val dir = graft.sources.eth.EthFixtures.ensure(spark)
    val erc = spark.read.format("ethereum").option("table", "erc20")
      .option("chain", dir).load()
      .groupBy($"erc20_token", $"erc20_from").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byToken = erc.groupBy(_._1)
    rows.foreach { r =>
      val token = r.getString(0)
      val cs = byToken(token).map(t => (t._3, t._2)).sortBy(identity).map(_._1.toLong)
      val n = BigInt(cs.length); val s = cs.map(BigInt(_)).sum
      val sic = cs.zipWithIndex.map { case (c, i) => BigInt(c) * (i + 1) }.sum
      val ssq = cs.map(c => BigInt(c) * c).sum
      assert(r.getLong(1) == n.toLong && r.getLong(2) == s.toLong)
      assert(r.getLong(3) == ((2 * sic - (n + 1) * s) * 1000000 / (n * s)).toLong, s"gini $token")
      assert(r.getLong(4) == (ssq * 1000000 / (s * s)).toLong, s"hhi $token")
      assert(r.getLong(5) == (BigInt(cs.max) * 1000000 / s).toLong, s"top share $token")
      // Gini and HHI live in [0, 1e6]; HHI is at least the uniform floor 1e6/n
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L)
      assert(r.getLong(4) >= (BigInt(1000000) / n).toLong && r.getLong(4) <= 1000000L)
    }
  }

  test("eth_q24 nonce audit counts reconcile with per-address raw sequences") {
    import spark.implicits._
    val dir = graft.sources.eth.EthFixtures.ensure(spark)
    val row = EthQueries.q24NonceAudit(spark, sf).collect().head
    val per = spark.read.format("ethereum").option("table", "transaction")
      .option("chain", dir).load()
      .select($"tx_from", $"tx_nonce").collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    val seqs = per.values.map(_.map(_._2).toSeq)
    assert(row.getLong(0) == per.size)
    assert(row.getLong(1) == seqs.map(_.size.toLong).sum)
    assert(row.getLong(2) == seqs.count(s => s.size != s.distinct.size).toLong)
    assert(row.getLong(3) == seqs.count(s => s.max - s.min + 1 != s.distinct.size).toLong)
    assert(row.getLong(4) == seqs.map(s => (s.size - s.distinct.size).toLong).sum)
    assert(row.getLong(5) == seqs.map(s => s.max - s.min + 1 - s.distinct.size).sum)
  }

  test("q51 recursive CTE equals a driver-side bounded path count") {
    import spark.implicits._
    val edges = Tables.lineitem(spark, sf)
      .filter($"l_partkey" <= 40)
      .select($"l_suppkey", $"l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val seed = edges.map(_._1).min
    val byS = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val byP = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    // UNION ALL recursion counts PATHS per level, not nodes
    var level = Seq(seed)
    val paths = scala.collection.mutable.HashMap((seed, 0) -> 1L)
    for (d <- 1 to 2) {
      level = level.flatMap(u => byS(u).flatMap(p => byP(p)))
      level.groupBy(identity).foreach { case (v, hits) =>
        paths((v, d)) = paths.getOrElse((v, d), 0L) + hits.length
      }
    }
    val expected = paths.toSeq.groupBy(_._1._1).toSeq.sortBy(_._1)
      .map { case (sKey, rows) =>
        (sKey, rows.map(_._1._2).min.toLong, rows.map(_._2).sum)
      }
    val got = Relational.q51RecursiveCte(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected,
      s"recursive reach mismatch: got=${got.take(3)} exp=${expected.take(3)}")
    // the seed is its own depth-0 row
    assert(got.exists { case (sk, h, _) => sk == seed && h == 0L })
  }

  test("eth_q37 k-core equals a driver-side peel replay; core property holds") {
    import spark.implicits._
    val dir = graft.sources.eth.EthFixtures.ensure(spark)
    val und = spark.read.format("ethereum")
      .option("table", "erc20").option("chain", dir).load()
      .select($"erc20_token",
              least($"erc20_from", $"erc20_to").as("a"),
              greatest($"erc20_from", $"erc20_to").as("b"))
      .filter($"a" =!= $"b").distinct().collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // independent driver-side peel: adjacency sets per token, remove
    // degree-<k nodes until fixpoint (unbounded rounds — if the query's
    // 12-round cap were ever too small, this comparison would catch it)
    val k = 3
    val expected = und.groupBy(_._1).flatMap { case (tok, es) =>
      var edges = es.map(e => (e._2, e._3)).toSet
      var changed = true
      var roundsUsed = 0
      while (changed) {
        val deg = (edges.toSeq.map(_._1) ++ edges.toSeq.map(_._2))
          .groupBy(identity).view.mapValues(_.size).toMap
        val keep = deg.filter(_._2 >= k).keySet
        val next = edges.filter(e => keep(e._1) && keep(e._2))
        changed = next.size != edges.size
        edges = next
        roundsUsed += 1
      }
      assert(roundsUsed <= EthQueries.KCoreRounds,
        s"fixture peel needs $roundsUsed rounds > cap ${EthQueries.KCoreRounds}")
      if (edges.isEmpty) None
      else {
        val deg = (edges.toSeq.map(_._1) ++ edges.toSeq.map(_._2))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        // core property: every surviving node has degree >= k
        assert(deg.values.forall(_ >= k), s"$tok core violates degree >= $k")
        Some((tok, deg.size.toLong, edges.size.toLong,
              deg.values.max, deg.values.min))
      }
    }.toSeq.sortBy(_._1)
    val got = EthQueries.q37KCore(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                 r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected,
      s"k-core mismatch: got=${got.take(3)} exp=${expected.take(3)}")
  }

  test("q49 unpivot emits 4 metric rows per nation matching the wide aggregate") {
    import spark.implicits._
    val long = Relational.q49Unpivot(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val wide = spark.read.parquet(s"$sf/customer.parquet")
      .join(spark.read.parquet(s"$sf/nation.parquet"), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n"), sum(graft.operators.Money.cents($"c_acctbal")).as("t"),
           min(graft.operators.Money.cents($"c_acctbal")).as("mn"),
           max(graft.operators.Money.cents($"c_acctbal")).as("mx"))
      .collect()
    assert(long.size == wide.length * 4)
    wide.foreach { r =>
      val nat = r.getString(0)
      assert(long((nat, "n_cust")) == r.getLong(1))
      assert(long((nat, "total_bal_cents")) == r.getLong(2))
      assert(long((nat, "min_bal_cents")) == r.getLong(3))
      assert(long((nat, "max_bal_cents")) == r.getLong(4))
    }
  }
}
