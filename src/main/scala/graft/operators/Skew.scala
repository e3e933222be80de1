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

  /** Deterministic per-row salt: a content hash of EVERY column, so a row
    * re-computed after a shuffle-fetch failure + stage retry lands on the
    * same salt (`monotonically_increasing_id`/`rand` here is the classic
    * SPARK-23207 duplicate/loss hazard — nondeterministic re-salting can
    * send a retried row to a different reducer than its first attempt).
    * Identical duplicate rows share a salt; the spread is over distinct
    * row contents, which is what an aggregation/join key's value skew is
    * made of. */
  private def contentSalt(df: DataFrame, salts: Int): Column =
    pmod(hash(df.columns.map(col).toSeq: _*), lit(salts))

  /** Two-phase salted aggregation for algebraic aggregates (sum/count/
    * min/max): phase 1 groups on (key, content-hash salt in [0, salts)),
    * phase 2 merges the partials per key. INTEGRAL sums accumulate as
    * DECIMAL(28,0) in BOTH phases (the [[Money.sumCents]] discipline —
    * a plain long sum wraps silently in non-ANSI mode at extreme
    * per-group mass); double sums stay double (already saturating). */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
      aggs: (String, String, String)*): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    // aggs: (function, inputCol, outAlias) with function in sum|count|min|max
    def aggOne(a: (String, String, String)): Column = a match {
      case ("count", c, out) => count(col(c)).as(out)
      case ("sum", c, out) =>
        val integral = Set[org.apache.spark.sql.types.DataType](
          ByteType, ShortType, IntegerType, LongType).contains(df.schema(c).dataType)
        sum(if (integral) col(c).cast("decimal(28,0)") else col(c)).as(out)
      case ("min", c, out)   => min(col(c)).as(out)
      case ("max", c, out)   => max(col(c)).as(out)
      case (fn, _, _) => throw new IllegalArgumentException(s"non-algebraic agg $fn")
    }
    val salted = df.withColumn("__salt", contentSalt(df, salts))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggOne(aggs.head), aggs.tail.map(aggOne): _*)
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

  /** Salted join for a skewed left side against a small-but-not-broadcast
    * right side: left rows get a deterministic content-hash salt, right
    * rows are replicated once per salt value, and the join key becomes
    * (key, salt) — the hot key's rows spread across `salts` reducers. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, salts: Int): DataFrame = {
    val l = left.withColumn("__salt", contentSalt(left, salts))
    val r = right.withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
