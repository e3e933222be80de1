package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact money arithmetic that stays in primitive longs on the hot path.
  *
  * The corpus money columns (`l_extendedprice`, `l_discount`,
  * `o_totalprice`) are 2-decimal values carried as doubles. Summing
  * doubles is summation-order sensitive (caught at sf0.001: Spark and the
  * oracle rounded a repr-half tie differently), so round 2 moved the money
  * aggregates to DECIMAL(18,6) — exact, but the per-row
  * double→wide-decimal casts and BigDecimal multiplies roughly doubled
  * q29/q31/q01 (round-2 review, "What's wrong" #3).
  *
  * This helper keeps exactness with none of the per-row decimal cost:
  *
  *  1. per row, money becomes integer fixed-point via `round(x*100)` —
  *     exact for 2-decimal data (fp error of x*100 is ≪ 0.5) — and revenue
  *     `price·(1−disc)` is a LONG product in 1e-4 dollars: all primitive,
  *     codegen-friendly ops;
  *  2. the sum runs over those integers (wrapped to DECIMAL(28,0) so the
  *     aggregate composes beyond long range at extreme scale — compact
  *     unscaled-long fast path until ~9.2e14 dollars per group);
  *  3. ONE multiply by the exact literal 0.0001/0.01 per GROUP converts
  *     back to dollars.
  *
  * Every step is exact integer/decimal arithmetic, so results stay
  * bit-identical to the oracle's DECIMAL(18,6) formulation at any scale
  * factor and any summation order.
  */
object Money {

  /** Exact integer cents of a 2-decimal money double. */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** Exact revenue `price·(1−discount)` in 1e-4 dollars as a long. */
  def rev4(price: Column, disc: Column): Column =
    cents(price) * (lit(100L) - cents(disc))

  private val toDollars4 = lit(new java.math.BigDecimal("0.0001"))
  private val toDollars2 = lit(new java.math.BigDecimal("0.01"))

  /** Exact dollar sum of per-row [[rev4]] values (decimal result). */
  def sumRev4(scaled: Column): Column =
    sum(scaled.cast("decimal(28,0)")) * toDollars4

  /** Exact dollar sum of per-row [[cents]] values (decimal result). */
  def sumCents(scaled: Column): Column =
    sum(scaled.cast("decimal(28,0)")) * toDollars2
}
