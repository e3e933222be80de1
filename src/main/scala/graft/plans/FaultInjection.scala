package graft.plans

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame

/** Test-only task-failure injection.
  *
  * The iterative operators (PageRank, label propagation, taint closure)
  * and the drained streams claim a recovery contract: with
  * `spark.graft.checkpointDir` set, loop state survives task loss and the
  * final result is bit-identical to an undisturbed run. Plan shape alone
  * cannot prove that — only an actual mid-loop task failure can. This
  * seam lets a spec plant one: when `spark.graft.test.failOnce` is set to
  * a nonempty key, [[Caching.iterCheckpoint]] wraps the state frame so
  * that the FIRST attempt of partition 0's task throws, at most
  * `spark.graft.test.failOnce.count` times (default 2) per key. Retried
  * attempts (`attemptNumber > 0`) always pass, so under a
  * retry-capable scheduler (`local[N,F]`, or any real cluster) the job
  * recovers and the values must come out unchanged.
  *
  * With the conf unset (production, the driver's Verify/Bench runs) the
  * wrap never happens and plans are untouched — the hook costs nothing.
  * The fire counter is JVM-static, which is exactly right in local mode
  * (executors share the JVM) and irrelevant in production where the conf
  * is never set.
  */
object FaultInjection {

  private val fired = new ConcurrentHashMap[String, AtomicInteger]()

  /** Number of failures already injected under `key` (spec assertion
    * support: proving the fault actually fired, not silently skipped). */
  def firedCount(key: String): Int = {
    val c = fired.get(key); if (c == null) 0 else c.get()
  }

  def reset(key: String): Unit = fired.remove(key)

  private[plans] def maybeWrap(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption("spark.graft.test.failOnce").filter(_.nonEmpty) match {
      case None => df
      case Some(key) =>
        val maxFires = spark.conf.getOption("spark.graft.test.failOnce.count")
          .map(_.toInt).getOrElse(2)
        val schema = df.schema
        // df.rdd deserializes to Row — acceptable: this branch only exists
        // under the test conf; the production path above is the plain frame
        val rdd = df.rdd.mapPartitionsWithIndex { (i, it) =>
          if (i == 0) {
            val ctx = TaskContext.get()
            if (ctx != null && ctx.attemptNumber() == 0) {
              val n = fired.computeIfAbsent(key, _ => new AtomicInteger(0))
              if (n.incrementAndGet() <= maxFires)
                throw new RuntimeException(
                  s"graft injected task failure ($key, fire ${n.get()})")
              else n.decrementAndGet()
            }
          }
          it
        }
        spark.createDataFrame(rdd, schema)
    }
  }
}
