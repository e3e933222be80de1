package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch micro-probe for round-14 optimization experiments: times
  * alternative formulations of one operator under the bench session
  * settings. Not part of any gate; numbers land in OPTIMIZATION_r14.md. */
object ProbeR14 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
      println(f"[probe] $name%-40s min=${ts.min}%6.2fs  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup
    noop(graft.operators.Events.sessions(spark, sfDir))

    val iv0 = () => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ms", $"event_id")
      graft.Tables.events(spark, sfDir)
        .select($"event_id", $"user_id", unix_millis($"ts").as("ms"))
        .withColumn("brk", when(lag($"ms", 1).over(w).isNull ||
          $"ms" - lag($"ms", 1).over(w) > 1800000L, 1L).otherwise(0L))
        .withColumn("sid", sum($"brk").over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
        .groupBy($"user_id", $"sid")
        .agg(min($"ms").as("s_ms"), max($"ms").as("e_ms"))
    }

    def tail(iv: DataFrame): DataFrame = {
      val deltas = iv.select($"s_ms".as("ms"), lit(1L).as("delta"))
        .unionByName(iv.select(($"e_ms" + 1L).as("ms"), lit(-1L).as("delta")))
        .groupBy($"ms").agg(sum($"delta").as("net"))
      graft.plans.ScalableNtile
        .runningTotal(deltas, $"net", Seq($"ms"), "level")
        .groupBy(expr("ms div 86400000").as("day"))
        .agg(max($"level").as("max_concurrent"),
             count(lit(1)).as("n_boundary_ms"),
             sum($"net").as("net_day"))
        .orderBy($"day")
    }

    time("concurrency: lazy iv (original)") { noop(tail(iv0())) }

    time("concurrency: persist iv") {
      val iv = iv0().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      noop(tail(iv))
      iv.unpersist(blocking = false)
    }

    time("concurrency: checkpoint iv") {
      val iv = graft.plans.Caching.iterCheckpoint(iv0())
      noop(tail(iv))
      graft.plans.Caching.freeCheckpoint(iv)
    }

    time("concurrency: persist iv + detach") {
      val iv = iv0().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      noop(graft.plans.Caching.detach(tail(iv),
        () => { iv.unpersist(blocking = false); () }))
    }

    time("concurrency: persist deltas only") {
      val iv = iv0()
      val deltas = iv.select($"s_ms".as("ms"), lit(1L).as("delta"))
        .unionByName(iv.select(($"e_ms" + 1L).as("ms"), lit(-1L).as("delta")))
        .groupBy($"ms").agg(sum($"delta").as("net"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out = graft.plans.ScalableNtile
        .runningTotal(deltas, $"net", Seq($"ms"), "level")
        .groupBy(expr("ms div 86400000").as("day"))
        .agg(max($"level").as("max_concurrent"),
             count(lit(1)).as("n_boundary_ms"),
             sum($"net").as("net_day"))
        .orderBy($"day")
      noop(out)
      deltas.unpersist(blocking = false)
    }

    spark.stop()
  }
}
