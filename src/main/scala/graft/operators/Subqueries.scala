package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Catalog

/** Subquery / decorrelation operator class: scalar subqueries, correlated
  * EXISTS / NOT EXISTS, IN-subqueries with aggregation — expressed through
  * `spark.sql` over mounted views so Catalyst's `RewriteSubquery` /
  * decorrelation rules (free Layer-B capability, SURVEY.md §0) plan them
  * as joins: scalar subquery → broadcast of a 1-row aggregate, EXISTS →
  * left-semi, NOT EXISTS → left-anti, IN+HAVING → semi join on the
  * aggregated side. No driver-side loops, no per-row re-execution.
  */
object Subqueries {
  private def sql(s: SparkSession, d: String, q: String): DataFrame = {
    Catalog.mountCorpus(s, d)
    s.sql(q)
  }

  /** Uncorrelated scalar subquery (above-average filter). */
  def q16ScalarSubquery(s: SparkSession, d: String): DataFrame = sql(s, d,
    """SELECT p_brand, count(*) AS n,
       round(avg(p_retailprice), 2) AS avg_price
       FROM part
       WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
       GROUP BY p_brand ORDER BY p_brand""")

  /** Correlated EXISTS with a predicate on the inner relation. */
  def q17CorrExists(s: SparkSession, d: String): DataFrame = sql(s, d,
    """SELECT c_mktsegment, count(*) AS n_customers
       FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
       GROUP BY c_mktsegment ORDER BY c_mktsegment""")

  /** IN-subquery over an aggregated-HAVING inner query (TPC-H Q18 shape). */
  def q18InSubqueryAgg(s: SparkSession, d: String): DataFrame = sql(s, d,
    """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
       FROM orders
       WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                            GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
       ORDER BY o_orderkey""")

  /** Correlated NOT EXISTS (anti join). */
  def q19NotExists(s: SparkSession, d: String): DataFrame = sql(s, d,
    """SELECT c_mktsegment, count(*) AS n_orderless
       FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
       GROUP BY c_mktsegment ORDER BY c_mktsegment""")

  /** Correlated scalar subquery (TPC-H Q17 shape): per-group threshold. */
  def q20CorrScalar(s: SparkSession, d: String): DataFrame = sql(s, d,
    """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_below, count(*) AS n_items
       FROM lineitem l1
       WHERE l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
                           WHERE l2.l_partkey = l1.l_partkey)""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q16_scalar_subquery" -> q16ScalarSubquery _,
    "q17_corr_exists" -> q17CorrExists _,
    "q18_in_subquery_agg" -> q18InSubqueryAgg _,
    "q19_not_exists" -> q19NotExists _,
    "q20_corr_scalar" -> q20CorrScalar _)

  val oracle: Map[String, String] = Map(
    "q16_scalar_subquery" ->
      """SELECT p_brand, count(*) AS n, round(avg(p_retailprice), 2) AS avg_price
         FROM part WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
         GROUP BY p_brand ORDER BY p_brand""",
    "q17_corr_exists" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q18_in_subquery_agg" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice FROM orders
         WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                              GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
         ORDER BY o_orderkey""",
    "q19_not_exists" ->
      """SELECT c_mktsegment, count(*) AS n_orderless FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q20_corr_scalar" ->
      """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_below, count(*) AS n_items
         FROM lineitem l1
         WHERE l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
                             WHERE l2.l_partkey = l1.l_partkey)""")
}
