package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities: salted two-phase aggregation and salted
  * broadcast-replicated joins.
  *
  * AQE's skew-join splitting handles most runtime skew; these are the
  * explicit operators for the pathological cases AQE can't fix — a single
  * hot group in an aggregation (one reducer owns the key) and a hot key
  * joined against a non-broadcastable side. Salting spreads each hot key
  * over `salts` sub-keys, pays a second (tiny) reduce over `salts` rows
  * per key, and keeps every reducer bounded.
  */
object Skew {

  /** Two-phase salted aggregation for algebraic aggregates (sum/count/
    * min/max): phase 1 groups on (key, random salt in [0, salts)), phase 2
    * merges the partials per key. */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
      aggs: (String, String, String)*): DataFrame = {
    // aggs: (function, inputCol, outAlias) with function in sum|count|min|max
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggHead(aggs.head), aggs.tail.map(aggOne): _*)
    val phase2Aggs = aggs.map {
      case ("count", _, out) => sum(col(out)).as(out)
      case ("sum", _, out)   => sum(col(out)).as(out)
      case ("min", _, out)   => min(col(out)).as(out)
      case ("max", _, out)   => max(col(out)).as(out)
      case (fn, _, _) => throw new IllegalArgumentException(s"non-algebraic agg $fn")
    }
    phase1.groupBy(keys.map(col): _*)
      .agg(phase2Aggs.head, phase2Aggs.tail: _*)
  }

  private def aggOne(a: (String, String, String)): Column = a match {
    case ("count", c, out) => count(col(c)).as(out)
    case ("sum", c, out)   => sum(col(c)).as(out)
    case ("min", c, out)   => min(col(c)).as(out)
    case ("max", c, out)   => max(col(c)).as(out)
    case (fn, _, _) => throw new IllegalArgumentException(s"non-algebraic agg $fn")
  }
  private def aggHead(a: (String, String, String)): Column = aggOne(a)

  /** Salted join for a skewed left side against a small-but-not-broadcast
    * right side: left rows get a random salt, right rows are replicated
    * once per salt value, and the join key becomes (key, salt) — the hot
    * key's rows spread across `salts` reducers. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, salts: Int): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val r = right.withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
