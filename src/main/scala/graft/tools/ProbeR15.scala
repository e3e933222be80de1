package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Expressions
import graft.operators.Similarity

/** Scratch micro-probe for round-15 optimization experiments: times
  * alternative formulations of one operator under the bench session
  * settings. Not part of any gate; numbers land in OPTIMIZATION_r15.md. */
object ProbeR15 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val which = if (args.nonEmpty) args.toSet else Set("graph")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-44s min=${ts.min}%6.2fs  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val micro = (c: Column) => round(c * 1000000, 0).cast("long")
    def vecs = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))

    // current graphBuild pair stage, reproduced (window form)
    def buildWindow(m: Int, degCap: Int, buildProbes: Int): DataFrame = {
      val centroids = Similarity.lloydCentroids(vecs, 16, Similarity.DefaultLloydIters)
      val multi = Similarity.coarseAssignTopN(vecs, centroids, buildProbes)
      val a = multi.select($"list_id", $"vec_id", $"v")
      val b = multi.select($"list_id", $"vec_id".as("dst"), $"v".as("bv"))
      val wDeg = Window.partitionBy($"src").orderBy($"sim_micro".desc, $"dst")
      val knn = a.join(b, Seq("list_id"))
        .filter($"vec_id" =!= $"dst")
        .select($"vec_id".as("src"), $"dst",
                micro(Expressions.cosineSim($"v", $"bv")).as("sim_micro"))
        .dropDuplicates("src", "dst")
        .withColumn("rn", row_number().over(wDeg)).filter($"rn" <= m)
        .select($"src", $"dst", $"sim_micro")
      knn
        .unionByName(knn.select($"dst".as("src"), $"src".as("dst"), $"sim_micro"))
        .dropDuplicates("src", "dst")
        .withColumn("rn", row_number().over(wDeg)).filter($"rn" <= degCap)
        .select($"src", $"dst")
    }

    // candidate: two-level top-m partial aggregates, no corpus-scale window
    def buildAgg(m: Int, degCap: Int, buildProbes: Int): DataFrame = {
      val centroids = Similarity.lloydCentroids(vecs, 16, Similarity.DefaultLloydIters)
      val multi = Similarity.coarseAssignTopN(vecs, centroids, buildProbes)
      val a = multi.select($"list_id", $"vec_id", $"v")
      val b = multi.select($"list_id", $"vec_id".as("dst"), $"v".as("bv"))
      def topM(df: DataFrame, k: Int): DataFrame = df
        .groupBy($"src")
        .agg(slice(array_sort(array_distinct(
          collect_list(struct((-$"sim_micro").as("ns"), $"dst")))), 1, k).as("cand"))
        .select($"src", explode($"cand").as("c"))
        .select($"src", $"c.dst".as("dst"), (-$"c.ns").as("sim_micro"))
      val perList = a.join(b, Seq("list_id"))
        .filter($"vec_id" =!= $"dst")
        .select($"list_id", $"vec_id".as("src"), $"dst",
                micro(Expressions.cosineSim($"v", $"bv")).as("sim_micro"))
        .groupBy($"list_id", $"src")
        .agg(slice(array_sort(
          collect_list(struct((-$"sim_micro").as("ns"), $"dst"))), 1, m).as("cand"))
        .select($"src", explode($"cand").as("c"))
        .select($"src", $"c.dst".as("dst"), (-$"c.ns").as("sim_micro"))
      val knn = topM(perList, m)
      topM(knn.unionByName(
          knn.select($"dst".as("src"), $"src".as("dst"), $"sim_micro")), degCap)
        .select($"src", $"dst")
    }

    if (which("pairs")) {
      val centroids = Similarity.lloydCentroids(vecs, 16, Similarity.DefaultLloydIters)
      val multi = graft.plans.Caching.iterCheckpoint(
        Similarity.coarseAssignTopN(vecs, centroids, 2))
      val a = multi.select($"list_id", $"vec_id", $"v")
      val b = multi.select($"list_id", $"vec_id".as("dst"), $"v".as("bv"))
      def pairsCos = a.join(b, Seq("list_id"))
        .filter($"vec_id" =!= $"dst")
        .select($"vec_id".as("src"), $"dst",
                micro(Expressions.cosineSim($"v", $"bv")).as("sim_micro"))
      val an = multi.select($"list_id", $"vec_id", $"v", Expressions.normSq($"v").as("nsq"))
      val bn = multi.select($"list_id", $"vec_id".as("dst"), $"v".as("bv"),
        Expressions.normSq($"v").as("bnsq"))
      def pairsDot = an.join(bn, Seq("list_id"))
        .filter($"vec_id" =!= $"dst")
        .select($"vec_id".as("src"), $"dst",
          micro(when($"nsq" === 0.0 || $"bnsq" === 0.0, lit(null))
            .otherwise(Expressions.dotProduct($"v", $"bv") / sqrt($"nsq" * $"bnsq")))
            .as("sim_micro"))
      // bit-identity check: micro values must agree on every pair
      val diff = pairsCos.as("x").join(pairsDot.as("y"),
          col("x.src") === col("y.src") && col("x.dst") === col("y.dst"))
        .filter(!(col("x.sim_micro") <=> col("y.sim_micro"))).count()
      val nPairs = pairsCos.count()
      println(s"[probe] pair micro mismatches: $diff of $nPairs pairs")
      time("pair scan: cosineSim per pair") { noop(pairsCos) }
      time("pair scan: normSq once + dot per pair") { noop(pairsDot) }
      graft.plans.Caching.freeCheckpoint(multi)
    }

    if (which("bfs")) {
      // knnGraph's search loop with different per-hop state disciplines
      def search(mode: String): DataFrame = {
        val centroids = Similarity.lloydCentroids(vecs, 16, Similarity.DefaultLloydIters)
        val capped = Similarity.graphBuild(vecs, centroids, 6, 8, 2)
        val edges = graft.plans.Caching.iterCheckpoint(
          capped.join(vecs.select($"vec_id".as("dst"), $"v".as("dv")), Seq("dst")))
        val medoids = Similarity.graphMedoids(vecs, centroids)
        val medoidV = vecs.join(broadcast(medoids), $"vec_id" === $"entry_id")
          .select($"list_id", $"entry_id", $"v".as("ev"))
        val queries = vecs.filter($"vec_id" < 5)
          .select($"vec_id".as("query_id"), $"v".as("qv"))
        val probes = Similarity.probeLists(queries, centroids, 2)
        def cut(df: DataFrame): DataFrame = mode match {
          case "ckpt" => graft.plans.Caching.iterCheckpoint(df)
          case "none" => df
          case "local" => graft.plans.Caching.detachSink(df)
        }
        var visited = cut(
          probes.join(broadcast(medoidV), Seq("list_id"))
            .select($"query_id", $"qv", $"entry_id".as("node"),
                    micro(Expressions.cosineSim($"qv", $"ev")).as("sim_micro"))
            .dropDuplicates("query_id", "node"))
        val wBeam = Window.partitionBy($"query_id").orderBy($"sim_micro".desc, $"node")
        for (_ <- 1 to 3) {
          val beamF = visited
            .withColumn("rn", row_number().over(wBeam)).filter($"rn" <= 8)
            .select($"query_id", $"qv", $"node")
          val expand = edges.join(broadcast(beamF), $"src" === $"node")
            .select($"query_id", $"qv", $"dst".as("node"),
                    micro(Expressions.cosineSim($"qv", $"dv")).as("sim_micro"))
          val next = cut(visited.unionByName(expand).dropDuplicates("query_id", "node"))
          if (mode == "ckpt") graft.plans.Caching.freeCheckpoint(visited)
          visited = next
        }
        val result = visited.filter($"node" =!= $"query_id")
          .withColumn("rank", row_number().over(wBeam).cast("long"))
          .filter($"rank" <= 5)
          .select($"query_id", $"node".as("neighbor_id"), $"sim_micro", $"rank")
          .orderBy($"query_id", $"rank")
        val frozen = visited
        graft.plans.Caching.detach(result, () => {
          graft.plans.Caching.freeCheckpoint(edges)
          graft.plans.Caching.freeCheckpoint(frozen)
        })
      }
      noop(search("ckpt")) // warmup
      val r0 = search("ckpt").collect().map(_.toSeq).toSeq
      val r1 = search("none").collect().map(_.toSeq).toSeq
      val r2 = search("local").collect().map(_.toSeq).toSeq
      println(s"[probe] bfs variants equal: ${r0 == r1 && r0 == r2}")
      time("knnGraph search: per-hop iterCheckpoint") { noop(search("ckpt")) }
      time("knnGraph search: no per-hop cut") { noop(search("none")) }
      time("knnGraph search: per-hop detachSink") { noop(search("local")) }
    }

    if (which("sdedup")) {
      // streamDedup variants in one JVM: store recompute-per-batch vs
      // checkpointed store, shuffled vs broadcast candidate join.
      import org.apache.spark.sql.streaming.Trigger
      import graft.operators.Dedup
      val docs = graft.Tables.documents(spark, sfDir)
      val split = 250L
      // two-batch parity split, same as docStreamTwoBatches
      val dir = graft.tools.TmpDirs.tmpDirCleaned("probe-sdedup")
      docs.filter(pmod($"doc_id", lit(2)) === 0).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/b0.parquet")
      docs.filter(pmod($"doc_id", lit(2)) === 1).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/b1.parquet")
      def stream = spark.readStream
        .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/b*.parquet")
        .filter($"doc_id" >= split)
      def run(ckpt: Boolean, bcast: Boolean): Unit = {
        val raw = Dedup.minhashBandStore(docs.filter($"doc_id" < split))
        val store = if (ckpt) graft.plans.Caching.iterCheckpoint(raw) else raw
        val out = graft.streaming.StreamingDedup.dedupStream(
          stream, store, broadcastStore = bcast)
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          spark.catalog.dropTempView("probe_sdedup_sink")
          val q = out.writeStream.format("memory").queryName("probe_sdedup_sink")
            .outputMode("complete").trigger(Trigger.AvailableNow()).start()
          require(q.awaitTermination(300000)); q.stop()
        } finally {
          spark.conf.set("spark.sql.shuffle.partitions", prev)
          if (ckpt) graft.plans.Caching.freeCheckpoint(store)
        }
        spark.table("probe_sdedup_sink").orderBy($"doc_id")
          .write.format("noop").mode("overwrite").save()
      }
      run(ckpt = false, bcast = false) // warmup
      time("sdedup: plain store, shuffled join (old)") { run(false, false) }
      time("sdedup: ckpt store, broadcast join (new)") { run(true, true) }
      time("sdedup: ckpt store, shuffled join") { run(true, false) }
      time("sdedup: plain store, broadcast join") { run(false, true) }
    }

    if (which("rocks")) {
      // state-store provider A/B over the heaviest stateful drains
      // (VERDICT r14 item 5): HDFS-backed default vs RocksDB, same
      // registry entries, min of 3 each, interleaved warmup first.
      val qs = Seq("nd_stream_dedup", "nd_stream_late", "nd_stream_percentiles",
        "nd_stream_cms", "nd_stream_kmv")
      val key = "spark.sql.streaming.stateStore.providerClass"
      val rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
      qs.foreach { q => noop(graft.SparkEntry.queries(q)(spark, sfDir)) } // warmup
      qs.foreach { q =>
        time(s"$q: hdfs-backed (default)") {
          noop(graft.SparkEntry.queries(q)(spark, sfDir)) }
        spark.conf.set(key, rocks)
        try time(s"$q: rocksdb") {
          noop(graft.SparkEntry.queries(q)(spark, sfDir)) }
        finally spark.conf.unset(key)
      }
    }

    if (which("lm")) {
      // trigramLmScore: current two-explode-pass form vs the (doc, gram,
      // count) single-pass form (VERDICT r14 item 3)
      import graft.functions.Expressions
      def docs = graft.Tables.documents(spark, sfDir)
      def gramsRaw = docs.select($"doc_id",
        explode(Expressions.charNgrams($"text", 3)).as("g"))
      def current: DataFrame = {
        val grams = gramsRaw
        val model = grams.groupBy($"g").agg(count(lit(1)).as("c"))
          .orderBy($"c".desc, $"g").limit(5000)
          .select($"g", log($"c".cast("double")).as("lf"))
        grams.join(broadcast(model), Seq("g"), "left_outer")
          .groupBy($"doc_id")
          .agg(round(avg(coalesce($"lf", lit(0.0))), 4).as("lm_score"),
               count(lit(1)).as("n_grams"))
      }
      def candidate: DataFrame = {
        val docGrams = graft.plans.Caching.iterCheckpoint(
          gramsRaw.groupBy($"doc_id", $"g").agg(count(lit(1)).as("cnt")))
        val model = docGrams.groupBy($"g").agg(sum($"cnt").as("c"))
          .orderBy($"c".desc, $"g").limit(5000)
          .select($"g", log($"c".cast("double")).as("lf"))
        val scored = docGrams.join(broadcast(model), Seq("g"), "left_outer")
          .groupBy($"doc_id")
          .agg(round(sum($"cnt" * coalesce($"lf", lit(0.0))) / sum($"cnt"), 4)
                 .as("lm_score"),
               sum($"cnt").as("n_grams"))
        graft.plans.Caching.detach(scored,
          () => graft.plans.Caching.freeCheckpoint(docGrams),
          maxLocalRows = 10000L)
      }
      noop(current); noop(candidate) // warmup
      val a = current.orderBy($"doc_id").collect().map(_.toSeq).toSeq
      val b = candidate.orderBy($"doc_id").collect().map(_.toSeq).toSeq
      val nDiff = a.zip(b).count { case (x, y) => x != y }
      println(s"[probe] lm rows equal: ${a == b} (${a.size} vs ${b.size} rows, $nDiff differ)")
      time("lm_score: two-explode (current)") { noop(current) }
      time("lm_score: doc-gram-count single pass") { noop(candidate) }
      time("lm_score: one explode scan only") { noop(gramsRaw) }
    }

    if (which("graph")) {
      // warmup both shapes once
      noop(buildWindow(6, 8, 2)); noop(buildAgg(6, 8, 2))
      // equivalence check first
      val w = buildWindow(6, 8, 2).orderBy($"src", $"dst").collect().map(_.toSeq).toSeq
      val g = buildAgg(6, 8, 2).orderBy($"src", $"dst").collect().map(_.toSeq).toSeq
      println(s"[probe] edge sets equal: ${w == g} (${w.size} vs ${g.size} edges)")
      time("graphBuild: window form (current)") { noop(buildWindow(6, 8, 2)) }
      time("graphBuild: two-level agg (candidate)") { noop(buildAgg(6, 8, 2)) }
      time("lloydCentroids only") {
        Similarity.lloydCentroids(vecs, 16, Similarity.DefaultLloydIters).count()
      }
      time("knnGraph full (current)") { noop(Similarity.knnGraph(spark, sfDir)) }
      time("knnGraphHealth full (current)") { noop(Similarity.knnGraphHealth(spark, sfDir)) }
    }

    spark.stop()
  }
}
