package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively: as-of join and
  * bounded-range join.
  *
  * Per the build preference order (compose built-ins > custom Expression >
  * custom LogicalPlan/Strategy), both are *compositions* that plan into
  * single-shuffle, no-cross-product physical shapes — a custom SparkPlan
  * would add nothing the composition doesn't already get from Catalyst:
  *
  *  - **as-of**: union both sides tagged, one window sort per key, carry
  *    the latest right-side row forward (`last(..., ignoreNulls)`), keep
  *    left rows. One shuffle on the key, O(n log n) per partition, no
  *    range cross product. This is the classic streaming-merge as-of.
  *  - **range**: bin both sides by the range width, replicate the probe
  *    side into adjacent bins, equi-join on (key, bin), residual-filter
  *    the exact bound. Cross product only within (key, bin) cells.
  */
object TemporalJoins {

  /** For each left row, attach the most recent right row with
    * `rightTs <= leftTs` and equal `by` key (left-outer semantics: nulls
    * when no prior right row). `rightCols` are the right-side payload
    * columns to carry; output = left columns + `asof_<col>` for each.
    */
  def asofJoin(left: DataFrame, right: DataFrame, by: String, tsCol: String,
      rightCols: Seq[String]): DataFrame = {
    val leftTagged = left.withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast("string"))
    val payload = struct(rightCols.map(col): _*)
    val rightTagged = right
      .select((Seq(col(by), col(tsCol)) :+ payload.as("__rpay")): _*)
      .withColumn("__side", lit(0))
    // align schemas: left keeps all its columns; right carries only payload
    val unioned = leftTagged.drop("__payload")
      .select((left.columns.toIndexedSeq.map(col) :+ col("__side") :+
        lit(null).cast(rightTagged.schema("__rpay").dataType).as("__rpay")): _*)
      .unionByName(
        rightTagged.select((left.columns.toIndexedSeq.map(c =>
          if (c == by || c == tsCol) col(c) else lit(null).cast(left.schema(c).dataType).as(c)) :+
          col("__side") :+ col("__rpay")): _*))
    // right rows sort before left rows at equal ts => >= semantics
    val w = Window.partitionBy(col(by)).orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned.withColumn("__last",
      last(col("__rpay"), ignoreNulls = true).over(w))
    val out = carried.filter(col("__side") === 1)
    rightCols.foldLeft(out) { case (df, c) =>
      df.withColumn(s"asof_$c", col("__last").getField(c))
    }.drop("__side", "__rpay", "__last")
  }

  /** Join left and right rows with equal `by` key and
    * `|leftTs - rightTs| <= rangeMs` (ts columns in millis), without a
    * per-key cross product: bin by `rangeMs`, replicate left into its
    * neighbor bins, equi-join, exact residual filter. */
  def rangeJoinBinned(left: DataFrame, right: DataFrame, by: String,
      leftTsMs: Column, rightTsMs: Column, rangeMs: Long): DataFrame = {
    val lBinned = left
      .withColumn("__lts", leftTsMs)
      .withColumn("__bin", explode(array(
        (floor(leftTsMs / rangeMs) - 1),
        floor(leftTsMs / rangeMs),
        (floor(leftTsMs / rangeMs) + 1))))
    val rBinned = right
      .withColumn("__rts", rightTsMs)
      .withColumn("__bin", floor(rightTsMs / rangeMs))
    lBinned.join(rBinned,
        lBinned(by) === rBinned(by) && lBinned("__bin") === rBinned("__bin") &&
        abs(lBinned("__lts") - rBinned("__rts")) <= rangeMs)
      .drop("__bin")
  }
}
