package graft.tools

import org.apache.spark.sql.SparkSession

/** Focused per-query timing harness for iterating on a few queries without
  * paying for the full Bench sweep: `sbt "runMain graft.tools.MicroBench
  * q21_approx_agg q10_distinct_agg"` times each named query 3x at
  * $SPARK_GRAFT_SF_DIR (default sf0.1) after a warmup. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries("q11_having")(spark, sfDir).write
      .format("noop").mode("overwrite").save() // warmup
    for (q <- args; i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[micro] $q%-24s run$i: ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    spark.stop()
  }
}
