package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second batch of TPC-H-shaped analytics (Q7/Q8/Q12/Q13/Q14/Q18/Q19/Q22
  * adapted to the test schema), same conventions as [[AnalyticsQueries]]. */
object AnalyticsQueries2 {
  import AnalyticsQueries.Q

  /** Q7: volume shipping between nation pairs (customer nation ≠ supplier
    * nation), by year. */
  def q7VolumeShipping(s: SparkSession, d: String): DataFrame = {
    val n1 = Tables.nation(s, d).select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val n2 = Tables.nation(s, d).select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
      .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
      .filter(col("cust_nation") =!= col("supp_nation"))
      .groupBy(col("cust_nation"), col("supp_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      // exact integer-cents arithmetic: the per-group sums here land exactly
      // on .xx5 often enough that float rounding ties diverge between
      // engines; summing (price·100)·(100−disc·100) as integers is
      // order-independent and bit-exact (Exact.cents snap, same as every
      // other money aggregate)
      .agg((sum(Exact.cents(col("l_extendedprice")) *
        (lit(100L) - Exact.cents(col("l_discount")))) / 10000.0).as("revenue"))
      .orderBy(col("cust_nation"), col("supp_nation"), col("l_year"))
  }

  /** Q8-shaped: one nation's share of total revenue per year within a
    * region's customers. */
  def q8MarketShare(s: SparkSession, d: String): DataFrame = {
    val joined = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      // volume in integer 10^-4-dollar units: both sums below are exact longs
      .withColumn("volume",
        Exact.cents(col("l_extendedprice")) * (lit(100L) - Exact.cents(col("l_discount"))))
      .withColumn("o_year", year(col("o_orderdate")).cast("long"))
    joined.groupBy(col("o_year"))
      .agg(Exact.rnd(sum(when(col("n_name") === "CHINA", col("volume")).otherwise(0L)).cast("double") /
        sum(col("volume")).cast("double"), 6).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** Q12-shaped: order-priority severity by lineitem quantity class. */
  def q12QuantityClass(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .withColumn("qty_class",
        when(col("l_quantity") >= 40, "heavy").otherwise("light"))
      .groupBy(col("qty_class"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
          .as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
          .as("low_line_count"))
      .orderBy(col("qty_class"))

  /** Q13: distribution of orders-per-customer, including zero-order
    * customers (left join + conditional count). */
  def q13CustomerDistribution(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** Q14: promo revenue share over a shipping window. */
  def q14PromoRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .withColumn("volume",
        Exact.cents(col("l_extendedprice")) * (lit(100L) - Exact.cents(col("l_discount"))))
      .agg(Exact.rnd(sum(when(col("p_type") === "PROMO", col("volume")).otherwise(0L))
          .cast("double") * 100.0 /
          sum(col("volume")).cast("double"), 6).as("promo_revenue"))

  /** Q18: large-volume customers — orders whose total quantity exceeds a
    * threshold (join back after a having-style aggregate). */
  def q18LargeOrders(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 150)
    big.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        Exact.rnd(col("total_qty"), 2).as("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(50)
  }

  /** Q19-shaped: revenue from disjunctive brand/size/quantity predicates —
    * the filter shape that stresses predicate pushdown. */
  def q19DisjunctiveFilters(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#13" && col("l_quantity").between(1, 20) &&
          col("p_size").between(1, 10)) ||
        (col("p_brand") === "Brand#19" && col("l_quantity").between(10, 30) &&
          col("p_size").between(1, 25)) ||
        (col("p_brand") === "Brand#5" && col("l_quantity").between(20, 40)))
      .agg(Exact.rnd(Exact.sumRevenue(col("l_extendedprice"), col("l_discount")), 2).as("revenue"))

  /** Q22-shaped: wealthy customers (above-average balance) with no orders —
    * scalar subquery + anti join. */
  def q22GlobalSalesOpportunity(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    // exact threshold: integer-cents avg, so both engines filter on the
    // identical double regardless of their internal sum order
    val bal = c.filter(col("c_acctbal") > 0.0)
      .agg(coalesce(sum(Exact.cents(col("c_acctbal"))), lit(0L)).as("s"),
        count(lit(1)).as("n")).collect()(0)
    // no positive balances -> SQL's scalar subquery is NULL -> no rows match
    if (bal.getLong(1) == 0L)
      return c.filter(lit(false))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          Exact.rnd(Exact.sumMoney(col("c_acctbal")), 2).as("totacctbal"))
    val avgBal = bal.getLong(0).toDouble / bal.getLong(1) / 100
    val bigOrders = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
    c.filter(col("c_acctbal") > avgBal)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"), Exact.rnd(Exact.sumMoney(col("c_acctbal")), 2).as("totacctbal"))
      .orderBy(col("c_mktsegment"))
  }

  val all: Map[String, Q] = Map(
    "q7_volume_shipping" -> (q7VolumeShipping _),
    "q8_market_share" -> (q8MarketShare _),
    "q12_quantity_class" -> (q12QuantityClass _),
    "q13_cust_distribution" -> (q13CustomerDistribution _),
    "q14_promo_revenue" -> (q14PromoRevenue _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q19_disjunctive" -> (q19DisjunctiveFilters _),
    "q22_sales_opportunity" -> (q22GlobalSalesOpportunity _)
  )

  private val q7vol: String = Exact.volSql()
  private val centsVol: String = Exact.volSql()

  val oracles: Map[String, String] = Map(
    "q7_volume_shipping" ->
      s"""SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
        |  year(l_shipdate) AS l_year,
        |  sum($q7vol) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3
        |ORDER BY cust_nation, supp_nation, l_year""".stripMargin,
    "q8_market_share" ->
      s"""SELECT year(o_orderdate) AS o_year,
        |  ${Exact.rndSql(s"CAST(sum(CASE WHEN n_name = 'CHINA' THEN $centsVol ELSE 0 END) AS DOUBLE) / CAST(sum($centsVol) AS DOUBLE)", 6)} AS mkt_share
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,
    "q12_quantity_class" ->
      """SELECT CASE WHEN l_quantity >= 40 THEN 'heavy' ELSE 'light' END AS qty_class,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY qty_class""".stripMargin,
    "q13_cust_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q14_promo_revenue" ->
      s"""SELECT ${Exact.rndSql(s"CAST(sum(CASE WHEN p_type = 'PROMO' THEN $centsVol ELSE 0 END) AS DOUBLE) * 100.0 / CAST(sum($centsVol) AS DOUBLE)", 6)}
        |  AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  floor((total_qty) * 100 + 0.5) / 100 AS total_qty
        |FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty
        |      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150) t
        |JOIN orders ON t.l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey
        |LIMIT 50""".stripMargin,
    "q19_disjunctive" ->
      s"""SELECT ${Exact.rndSql(Exact.sumRevenueSql("l_extendedprice", "l_discount"), 2)} AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#13' AND l_quantity BETWEEN 1 AND 20
        |       AND p_size BETWEEN 1 AND 10)
        |   OR (p_brand = 'Brand#19' AND l_quantity BETWEEN 10 AND 30
        |       AND p_size BETWEEN 1 AND 25)
        |   OR (p_brand = 'Brand#5' AND l_quantity BETWEEN 20 AND 40)""".stripMargin,
    "q22_sales_opportunity" ->
      s"""SELECT c_mktsegment, count(*) AS numcust,
        |  ${Exact.rndSql(Exact.sumMoneySql("c_acctbal"), 2)} AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT CAST(sum(${Exact.centsSql("c_acctbal")}) AS DOUBLE) / count(*) / 100
        |                   FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin
  )
}
