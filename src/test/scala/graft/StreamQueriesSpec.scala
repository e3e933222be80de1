package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, StreamQueries}

/** Registered drained-stream manifests (StreamQueries): the oracle pins
  * each against DuckDB per-round; here we pin the strongest cross-path
  * claim — the streamed ANN manifest is EXACTLY the batch IVF ranking —
  * and that every manifest drains non-empty (a silently-empty sink would
  * otherwise only surface as a driver-side row-count failure). */
class StreamQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("every registered stream manifest drains non-empty") {
    StreamQueries.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name drained empty")
    }
  }

  test("drained streaming KMV sketches equal the batch k-smallest sets") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val streamed = StreamQueries.streamKmv(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    // batch replay through the SAME aggregator over the static frame —
    // equality proves the state-store merge across the two micro-batches
    // reconstructed exactly the one-pass sketch
    val sketch = udaf(new graft.functions.KmvSketch(256),
      org.apache.spark.sql.Encoders.scalaLong)
    val norm = 255.0 * 1152921504606846976L.toDouble
    val batch = Tables.documents(spark, sf)
      .select($"source", explode(graft.operators.Dedup.shingleHashes($"text")).as("h"))
      .groupBy($"source").agg(sketch($"h").as("sk"))
      .select($"source", size($"sk").cast("long").as("k_used"),
        round(when(size($"sk") < 256, size($"sk").cast("double"))
          .otherwise(lit(norm) / element_at($"sk", 256).cast("double")), 4))
      .orderBy($"source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(streamed == batch,
      s"stream/batch KMV diverged: ${streamed.take(2)} vs ${batch.take(2)}")
    assert(streamed.nonEmpty && streamed.forall(_._3 > 0))
  }

  test("drained drift monitor equals the batch PSI row-for-row") {
    val batch = graft.operators.Eval.driftPsi(spark, sf).collect().toSeq
    val streamed = graft.operators.StreamQueries.streamDrift(spark, sf).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      "two-micro-batch drained PSI diverged from the batch monitor")
  }

  test("drained ANN manifest equals the batch IVF ranking row-for-row") {
    val streamed = StreamQueries.streamAnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val batch = Similarity.knnIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.sameElements(batch),
      s"stream/batch ranking diverged: ${streamed.take(3).mkString(",")} vs ${batch.take(3).mkString(",")}")
  }

  test("drained streaming percentiles equal the batch read-off row-for-row") {
    val streamed = StreamQueries.streamPercentiles(spark, sf).collect()
      .map(_.toSeq)
    val batch = graft.operators.Events.percentiles(spark, sf).collect()
      .map(_.toSeq)
    assert(streamed.length == batch.length && streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq,
      s"stream/batch percentiles diverged: ${streamed.take(2)} vs ${batch.take(2)}")
  }

  test("streaming percentiles survive a forced distributed fallback (maxLocalRows below histogram)") {
    // plant the guard BELOW the drained histogram's cell count so the
    // round-7 fix's distributed branch (lineage-cut sink, no driver
    // collect) is the one that actually runs, and prove the values are
    // untouched by which branch fired
    spark.conf.set("spark.graft.maxLocalRows", "10")
    try {
      val streamed = StreamQueries.streamPercentiles(spark, sf).collect().map(_.toSeq)
      val batch = graft.operators.Events.percentiles(spark, sf).collect().map(_.toSeq)
      assert(streamed.length == batch.length && streamed.nonEmpty)
      assert(streamed.toSeq == batch.toSeq,
        s"fallback-path percentiles diverged: ${streamed.take(2)} vs ${batch.take(2)}")
    } finally spark.conf.unset("spark.graft.maxLocalRows")
  }

  test("drained streaming ERC-20 decode equals the batch movement rows") {
    val streamed = StreamQueries.ethStreamTransfers(spark, sf).collect().map(_.toSeq)
    val batch = graft.operators.EthQueries
      .queries("eth_q4_erc20_movement")(spark, sf).collect().map(_.toSeq)
    assert(streamed.length == batch.length && streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq,
      s"stream/batch decode diverged: ${streamed.take(2)} vs ${batch.take(2)}")
  }

  test("streaming MERGE equals the one-shot batch upsert manifest") {
    val streamed = operators.StreamQueries.streamUpsert(spark, sf)
      .collect().map(_.toSeq)
    val batch = operators.Pipeline.upsertManifest(spark, sf)
      .collect().map(_.toSeq)
    assert(streamed.length == batch.length && streamed.nonEmpty)
    assert(streamed.sameElements(batch),
      "two sequential key-disjoint streaming merges must compose to the batch upsert")
  }

  test("drained streaming SCD2 equals the batch history's closed versions") {
    import org.apache.spark.sql.functions.col
    val streamed = StreamQueries.streamScd2(spark, sf)
      .collect().map(_.toSeq)
    val batch = operators.Events.scd2History(spark, sf)
      .filter(!col("is_current"))
      .select("user_id", "ver", "attr", "valid_from", "valid_to", "n_events")
      .collect().map(_.toSeq)
    assert(streamed.nonEmpty && streamed.length == batch.length,
      s"closed-version counts diverge: ${streamed.length} vs ${batch.length}")
    assert(streamed.sameElements(batch),
      "streaming SCD2 must emit exactly the batch history's closed versions")
  }

  test("drained streaming concurrency equals the batch sweep over closed sessions") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val streamed = StreamQueries.streamConcurrency(spark, sf)
      .collect().map(_.toSeq)
    // batch twin: the same sweep line over sessionIntervals minus each
    // user's LAST session (the one the append-mode stream keeps in state)
    val iv = operators.Events.sessionIntervals(spark, sf)
      .withColumn("mx", max($"sid").over(Window.partitionBy($"user_id")))
      .filter($"sid" < $"mx")
    val deltas = iv.select($"s_ms".as("ms"), lit(1L).as("delta"))
      .unionByName(iv.select(($"e_ms" + 1L).as("ms"), lit(-1L).as("delta")))
      .groupBy($"ms").agg(sum($"delta").as("net"))
    val batch = graft.plans.ScalableNtile
      .runningTotal(deltas, $"net", Seq($"ms"), "level")
      .groupBy(expr("ms div 86400000").as("day"))
      .agg(max($"level").as("max_concurrent"),
           count(lit(1)).as("n_boundary_ms"), sum($"net").as("net_day"))
      .orderBy($"day").collect().map(_.toSeq)
    assert(streamed.nonEmpty && streamed.sameElements(batch),
      "stream gauge diverges from the closed-session batch sweep")
  }

  test("late-data audit: drops happen, accounting cross-foots, grain is windows") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val r = StreamQueries.streamLate(spark, sf).collect()
    assert(r.length == 1)
    val (nWin, onTime, lateWins, nInput) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
    assert(nInput == Tables.events(spark, sf).count())
    // the straggler schedule genuinely exercises the drop path
    assert(lateWins > 0, "no windows were dropped — the schedule is not late")
    assert(nWin > 0 && onTime > 0 && onTime < nInput)
    // batch replay of the measured mechanics (same arithmetic as the
    // oracle, independent code): dropped windows + on-time rows
    val e = Tables.events(spark, sf)
      .select($"event_id", unix_millis($"ts").as("ms"))
    val isB2 = $"ms" >= 1706140800000L ||
      ($"ms" < 1705276800000L && pmod($"event_id", lit(20)) === 7)
    val w1 = e.filter($"ms" < 1705276800000L && pmod($"event_id", lit(20)) =!= 7)
      .agg(max($"ms")).head().getLong(0) - 7200000L
    val wf = e.agg(max($"ms")).head().getLong(0) - 7200000L
    val winEnd = ($"ms" - pmod($"ms", lit(21600000L))) + 21600000L
    val expLate = e.filter(isB2 && winEnd <= w1)
      .select(($"ms" - pmod($"ms", lit(21600000L))).as("w")).distinct().count()
    assert(lateWins == expLate, s"dropped-window grain: $lateWins vs $expLate")
    val surv = e.filter(!isB2 || winEnd > w1).filter(winEnd <= wf)
    assert(onTime == surv.count(), "on-time rows = surviving rows in closed windows")
    assert(nWin == surv.select(($"ms" - pmod($"ms", lit(21600000L)))).distinct().count())
  }
}
