package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Additional classic TPC-H-shaped analytics adapted to the corpus schema
  * (no partsupp/commitdate/phone columns — the operator shapes are what
  * matter: multi-dim joins with year extracts, profit expressions,
  * returned-item ranking, promo share, disjunctive predicate groups,
  * NOT-EXISTS + scalar-average combination).
  */
object TpchShapes {

  /** Q7/Q9 shape: revenue by (supplier nation, order year). */
  def q29NationVolume(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .join(orders(s, d), $"l_orderkey" === $"o_orderkey")
      .join(supplier(s, d), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(nation(s, d)), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name", year($"o_orderdate").cast("long").as("o_year"))
      // revenue exact (a double sum is summation-order sensitive and
      // Spark/DuckDB round repr-half ties differently — caught at sf0.001:
      // 3918590.075 rounded .08 vs .07) but computed as primitive
      // fixed-point longs on the hot path ([[Money]]); one decimal
      // conversion per group keeps results bit-identical to the oracle's
      // DECIMAL(18,6) form at any SF.
      .agg(round(Money.sumRev4(Money.rev4($"l_extendedprice", $"l_discount")), 2)
             .cast("double").as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy($"n_name", $"o_year")
  }

  /** Q10 shape: top returned-item revenue per customer. */
  def q30ReturnedItems(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d).filter($"l_returnflag" === "R")
      .join(orders(s, d), $"l_orderkey" === $"o_orderkey")
      .join(customer(s, d), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"n_name")
      .agg(round(sum($"l_extendedprice".cast("decimal(18,6)")
             * (lit(1) - $"l_discount".cast("decimal(18,6)"))), 2).cast("double")
             .as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  /** Q14 shape: promo revenue share (single-row percentage). */
  def q31PromoShare(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .join(part(s, d), $"l_partkey" === $"p_partkey")
      .agg(round(
        Money.sumRev4(when($"p_type" === "PROMO",
            Money.rev4($"l_extendedprice", $"l_discount")).otherwise(lit(0L)))
          .cast("double") * 100.0 /
        Money.sumRev4(Money.rev4($"l_extendedprice", $"l_discount"))
          .cast("double"), 4).as("promo_pct"))
  }

  /** Q19 shape: disjunctive predicate groups over a join. */
  def q32DisjunctivePredicates(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p1 = $"p_brand" === "Brand#13" && $"p_size".between(1, 10) && $"l_quantity" >= 10
    val p2 = $"p_brand" === "Brand#19" && $"p_size".between(5, 25) && $"l_quantity" >= 20
    val p3 = $"p_type" === "ECONOMY" && $"p_size".between(1, 15) && $"l_quantity" < 15
    lineitem(s, d)
      .join(part(s, d), $"l_partkey" === $"p_partkey")
      .filter(p1 || p2 || p3)
      .agg(round(sum($"l_extendedprice".cast("decimal(18,6)")
             * (lit(1) - $"l_discount".cast("decimal(18,6)"))), 2).cast("double").as("revenue"),
           count(lit(1)).as("n_items"))
  }

  /** Q22 shape: group code via modulo, scalar-average filter, NOT EXISTS. */
  def q33IdleCustomers(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.Catalog.mountCorpus(s, d)
    s.sql(
      """SELECT CAST(c_custkey % 10 AS BIGINT) AS code, count(*) AS numcust,
         round(sum(c_acctbal), 2) AS totacctbal
         FROM customer c
         WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
           AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         GROUP BY c_custkey % 10 ORDER BY code""")
  }

  /** Q16 shape: distinct supplier breadth per part attribute, with an
    * excluded brand (lineitem as the part↔supplier bridge). */
  def q34SupplierBreadth(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .join(part(s, d), $"l_partkey" === $"p_partkey")
      .filter($"p_brand" =!= "Brand#13")
      .groupBy($"p_brand", $"p_type")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type")
  }

  /** Z-ORDER locality manifest — the inspection query for the
    * [[graft.plans.Layout.zorderedWrite]] layout pass: Morton-interleave
    * `(l_partkey, l_suppkey)`, cut the Z range into 64 equal-width
    * buckets (the file boundaries a range-partitioned write would draw),
    * and report each bucket's 2-D bounding box. Contiguous Z ranges are
    * bounded boxes in BOTH dimensions — the property that lets parquet
    * footer min/max stats prune files for a filter on EITHER column,
    * where a single-column sort clusters only itself. Pure integer
    * mask/shift spreading, exactly replayable in SQL. */
  def q39ZorderLocality(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = lineitem(s, d).select($"l_partkey", $"l_suppkey")
    val bounds = li.agg(
      min($"l_partkey").as("pmin"), max($"l_partkey").as("pmax"),
      min($"l_suppkey").as("smin"), max($"l_suppkey").as("smax"))
    li.crossJoin(broadcast(bounds))
      .withColumn("pn",
        expr("CAST(((l_partkey - pmin) * 65535) DIV greatest(pmax - pmin, 1) AS BIGINT)"))
      .withColumn("sn",
        expr("CAST(((l_suppkey - smin) * 65535) DIV greatest(smax - smin, 1) AS BIGINT)"))
      .withColumn("z", graft.plans.Layout.zValue($"pn", $"sn"))
      // normalized z spans the full 32-bit square, so the 64 equal-width
      // buckets are exactly the top 6 bits
      .withColumn("zbucket", shiftright($"z", 26))
      .groupBy($"zbucket")
      .agg(count(lit(1)).as("n_rows"),
           min($"l_partkey").as("p_min"), max($"l_partkey").as("p_max"),
           min($"l_suppkey").as("s_min"), max($"l_suppkey").as("s_max"))
      .orderBy($"zbucket")
  }

  /** Skew-mitigated aggregation ([[Skew.saltedAgg]]) earning its oracle
    * row: `l_returnflag` has only 3 values, so a plain `groupBy` funnels a
    * third of a 100 TB corpus through each of 3 reducers. The salted form
    * spreads every group over 16 sub-keys (phase 1) and merges 16 partial
    * rows per group (phase 2) — every reducer bounded, result identical.
    * The oracle is the PLAIN group-by: correctness of salting IS
    * plan-shape-invariance of the answer. Money stays exact integer cents
    * on the hot path ([[Money.cents]]). */
  def q40SaltedAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = lineitem(s, d).select($"l_returnflag",
      Money.cents($"l_extendedprice").as("cents"))
    // the salted sum accumulates as DECIMAL(28,0) in both phases (no long
    // wrap at any per-group mass); the final cast to BIGINT is presentation
    Skew.saltedAgg(base, Seq("l_returnflag"), salts = 16,
        ("count", "cents", "n_items"), ("sum", "cents", "sum_cents"),
        ("min", "cents", "min_cents"), ("max", "cents", "max_cents"))
      .select($"l_returnflag", $"n_items", $"sum_cents".cast("long").as("sum_cents"),
              $"min_cents", $"max_cents")
      .orderBy($"l_returnflag")
  }

  /** Skew-mitigated join ([[Skew.saltedJoin]]) earning its oracle row: the
    * fact↔fact join key becomes (key, salt) with the right side replicated
    * once per salt, so a hot key's probe rows spread across `salts`
    * reducers instead of one. The oracle is the plain equi-join — same
    * invariance argument as [[q40SaltedAgg]]. Revenue is the exact
    * integer 1e-4-dollar product ([[Money.rev4]]). */
  def q41SaltedJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val l = lineitem(s, d).select($"l_orderkey",
      Money.rev4($"l_extendedprice", $"l_discount").as("rev4"))
    val o = orders(s, d).select($"o_orderkey", $"o_orderpriority")
    Skew.saltedJoin(l, o, "l_orderkey", "o_orderkey", salts = 8)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
           round(Money.sumRev4($"rev4"), 2).cast("double").as("revenue"))
      .orderBy($"o_orderpriority")
  }

  /** Bucketed co-located join ([[graft.plans.Layout.colocatedJoin]])
    * earning its oracle row: both fact sides are written bucketed on the
    * join key once (the ingest-time amortization), then joined
    * exchange-free — the plan ScaleSpec asserts has NO shuffle on either
    * side. The oracle is the plain join: the layout pass must never change
    * an answer. */
  def q42BucketedJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val l = lineitem(s, d).select($"l_orderkey", $"l_quantity")
    val o = orders(s, d).select($"o_orderkey", $"o_orderpriority")
    graft.plans.Layout.colocatedJoin(s, l, o, "l_orderkey", "o_orderkey",
        buckets = 8, namePrefix = "graft_q42")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
           round(sum($"l_quantity"), 2).as("sum_qty"))
      .orderBy($"o_orderpriority")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_salted_agg" -> q40SaltedAgg _,
    "q41_salted_join" -> q41SaltedJoin _,
    "q42_bucketed_join" -> q42BucketedJoin _,
    "q39_zorder_locality" -> ((s: SparkSession, d: String) => q39ZorderLocality(s, d)),
    "q29_nation_volume" -> q29NationVolume _,
    "q30_returned_items" -> q30ReturnedItems _,
    "q31_promo_share" -> q31PromoShare _,
    "q32_disjunctive_preds" -> q32DisjunctivePredicates _,
    "q33_idle_customers" -> q33IdleCustomers _,
    "q34_supplier_breadth" -> q34SupplierBreadth _)

  /** The 4-step Morton mask/shift spreading as a SQL expression (shared
    * with the documents-side Z-order manifest in [[Pipeline]]). */
  private[operators] def spreadSql(e: String): String = {
    val a = s"($e & 65535)"
    val b = s"(($a | ($a << 8)) & 16711935)"
    val d = s"(($b | ($b << 4)) & 252645135)"
    val f = s"(($d | ($d << 2)) & 858993459)"
    s"(($f | ($f << 1)) & 1431655765)"
  }

  val oracle: Map[String, String] = Map(
    // the salted/bucketed variants MUST produce the plain-plan answers:
    // the oracle for a physical-layout operator is the logical query
    "q40_salted_agg" ->
      """SELECT l_returnflag, count(*) AS n_items,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents,
         min(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS min_cents,
         max(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS max_cents
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q41_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                        * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q42_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
         round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q39_zorder_locality" ->
      s"""WITH m AS (
            SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
                   min(l_suppkey) AS smin, max(l_suppkey) AS smax
            FROM lineitem),
          n AS (
            SELECT l_partkey, l_suppkey,
                   ((l_partkey - pmin) * 65535) // greatest(pmax - pmin, 1) AS pn,
                   ((l_suppkey - smin) * 65535) // greatest(smax - smin, 1) AS sn
            FROM lineitem CROSS JOIN m),
          b AS (
            SELECT l_partkey, l_suppkey,
                   (${spreadSql("pn")} | (${spreadSql("sn")} << 1)) >> 26 AS zbucket
            FROM n)
          SELECT zbucket, count(*) AS n_rows,
                 min(l_partkey) AS p_min, max(l_partkey) AS p_max,
                 min(l_suppkey) AS s_min, max(l_suppkey) AS s_max
          FROM b GROUP BY zbucket ORDER BY zbucket""",
    "q29_nation_volume" ->
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                        * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name, year(o_orderdate) ORDER BY n_name, o_year""",
    "q30_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                        * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
         GROUP BY c_custkey, c_name, n_name
         ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "q31_promo_share" ->
      """SELECT round(
           CAST(sum(CASE WHEN p_type = 'PROMO'
               THEN CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6))) ELSE 0 END) AS DOUBLE) * 100.0 /
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 4) AS promo_pct
         FROM lineitem JOIN part ON l_partkey = p_partkey""",
    "q32_disjunctive_preds" ->
      """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10 AND l_quantity >= 10)
            OR (p_brand = 'Brand#19' AND p_size BETWEEN 5 AND 25 AND l_quantity >= 20)
            OR (p_type = 'ECONOMY' AND p_size BETWEEN 1 AND 15 AND l_quantity < 15)""",
    "q33_idle_customers" ->
      """SELECT CAST(c_custkey % 10 AS BIGINT) AS code, count(*) AS numcust,
         round(sum(c_acctbal), 2) AS totacctbal
         FROM customer c
         WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
           AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         GROUP BY c_custkey % 10 ORDER BY code""",
    "q34_supplier_breadth" ->
      """SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#13'
         GROUP BY p_brand, p_type
         ORDER BY supplier_cnt DESC, p_brand, p_type""")
}
