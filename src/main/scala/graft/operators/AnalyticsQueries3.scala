package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third batch: the correlated-subquery / having-on-scalar TPC-H shapes
  * (Q2/Q11/Q15/Q16/Q17/Q21 adapted), same conventions as
  * [[AnalyticsQueries]]. */
object AnalyticsQueries3 {
  import AnalyticsQueries.Q

  /** Q2-shaped: cheapest part per type (min-per-group + join back, the
    * correlated-min shape). */
  def q2CheapestPart(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
    val mins = p.groupBy(col("p_type")).agg(min(col("p_retailprice")).as("min_price"))
    p.join(broadcast(mins), Seq("p_type"))
      .filter(col("p_retailprice") === col("min_price"))
      .select(col("p_type"), col("p_partkey"), col("p_retailprice"))
      .orderBy(col("p_type"), col("p_partkey"))
  }

  /** Q11-shaped: parts whose revenue exceeds a fraction of total revenue
    * (HAVING against a scalar subquery). */
  def q11ImportantParts(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    // revenue kept as exact integer 10^-4-dollar units until the final
    // projection, so the threshold comparison is order-independent
    val vol = Exact.cents(col("l_extendedprice")) * (lit(100L) - Exact.cents(col("l_discount")))
    val perPart = li.groupBy(col("l_partkey")).agg(sum(vol).as("value_u"))
      .localCheckpoint(true) // reused by the threshold agg AND the filter
    val threshold = perPart.agg(coalesce(sum(col("value_u")), lit(0L)))
      .collect()(0).getLong(0).toDouble * 0.0008
    perPart.filter(col("value_u").cast("double") > threshold)
      .select(col("l_partkey"),
        Exact.rnd(col("value_u").cast("double") / lit(1e4), 2).as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  /** Q15-shaped: the top-revenue supplier(s) over a window (max scalar
    * subquery, ties kept). */
  def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    // exact integer revenue units: the max and its tie test are integer
    // comparisons, so "ties kept" cannot be perturbed by FP sum order
    val vol = Exact.cents(col("l_extendedprice")) * (lit(100L) - Exact.cents(col("l_discount")))
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(vol).as("total_u"))
      .localCheckpoint(true) // reused by the max collect AND the tie filter
    val bestRow = rev.agg(max(col("total_u"))).collect()(0)
    if (bestRow.isNullAt(0)) return rev.filter(lit(false))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        Exact.rnd(col("total_u").cast("double") / lit(1e4), 2).as("total_rev"))
    val best = bestRow.getLong(0)
    rev.filter(col("total_u") === best)
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        Exact.rnd(col("total_u").cast("double") / lit(1e4), 2).as("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  /** Q16-shaped: distinct suppliers serving each (brand, type). */
  def q16SupplierCounts(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"))

  /** Q17-shaped: revenue from small-quantity orders of each part —
    * lineitems below half the part's average quantity (correlated avg). */
  def q17SmallQuantity(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val avgQty = li.groupBy(col("l_partkey"))
      .agg((avg(col("l_quantity")) * 0.5).as("half_avg"))
    li.join(avgQty, Seq("l_partkey"))
      .filter(col("l_quantity") < col("half_avg"))
      .agg(Exact.rnd(sum(Exact.cents(col("l_extendedprice"))).cast("double") / 100 / 7.0, 2)
        .as("avg_yearly"))
  }

  /** Q21-shaped: suppliers that were the sole supplier on a finished
    * order (EXISTS + NOT EXISTS combination). */
  def q21SoleSupplier(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val fOrders = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
    val perOrderSupp = li.join(fOrders, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    // sole-supplier detection as a partial-aggregatable groupBy (count
    // plus min — when the count is 1 the min IS the one supplier), not a
    // window: same rows out, map-side combinable, no per-key sort
    val sole = perOrderSupp
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"), min(col("l_suppkey")).as("l_suppkey"))
      .filter(col("n_supp") === 1)
    sole.join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
  }

  /** Q9-shaped: product-type profit per (supplier nation, year). The test
    * schema has no partsupp, so supply cost is proxied as 10% of
    * p_retailprice per unit; profit stays exact-integer arithmetic
    * (10^-5-dollar units) end to end. */
  def q9ProductProfit(s: SparkSession, d: String): DataFrame = {
    val amountU = // 10^-5-dollar units, all factors integer
      Exact.cents(col("l_extendedprice")) *
        (lit(100L) - Exact.cents(col("l_discount"))) * lit(10L) -
      Exact.cents(col("p_retailprice")) * Exact.cents(col("l_quantity"))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("l_shipdate")).cast("long").as("o_year"))
      .agg(Exact.rnd(sum(amountU).cast("double") / lit(1e5), 2).as("sum_profit"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  /** Q20-shaped: dominant suppliers — shipped more than a fifth of some
    * part's total quantity (correlated share-of-total + semi join). Integer
    * quantity sums, threshold as 5·supp > total: exact on both engines. */
  def q20ExcessSupply(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    // floor() mirrored on both sides: Spark cast truncates toward zero but
    // DuckDB CAST(DOUBLE AS BIGINT) rounds — bare casts would diverge on
    // fractional quantities
    val qty = sum(floor(col("l_quantity")).cast("long"))
    val perPart = li.groupBy(col("l_partkey")).agg(qty.as("tq"))
    val perSupp = li.groupBy(col("l_partkey"), col("l_suppkey")).agg(qty.as("sq"))
    val dominant = perSupp.join(perPart, Seq("l_partkey"))
      .filter(col("sq") * 5 > col("tq"))
      .select(col("l_suppkey")).distinct()
    Tables.supplier(s, d)
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  /** Percentile summary: exact interpolated median / p90 of order value
    * per status — Spark's exact `percentile` and DuckDB's `quantile_cont`
    * share the type-7 linear-interpolation definition, and the outputs
    * snap to cents. Exact percentiles inherently gather each group's
    * values; the shuffle carries (status, price) pairs only. */
  def qPercentiles(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).groupBy(col("o_orderstatus"))
      .agg(Exact.rnd(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        Exact.rnd(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** Mean and stddev from EXACT integer moments: Σcents and Σcents² as
    * DECIMAL(38,0) (associative, order-independent — no Welford-style
    * merge whose low bits depend on partition order), then identical
    * double arithmetic on identical integers in both engines. The exact
    * second-moment pattern for any distributed spread statistic. */
  def qPriceStats(s: SparkSession, d: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val c = Exact.cents(col("o_totalprice"))
    Tables.orders(s, d).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(c.cast(dec)).as("_s1"),
        sum(c.cast(dec) * c).as("_s2"))
      .select(col("o_orderstatus"), col("n"),
        Exact.rnd(col("_s1").cast("double") / col("n") / 100, 2).as("mean"),
        Exact.rnd(sqrt((col("_s2").cast("double") -
          col("_s1").cast("double") * col("_s1").cast("double") / col("n")) /
          (col("n") - 1)) / 100, 2).as("sd"))
      .orderBy(col("o_orderstatus"))
  }

  val all: Map[String, Q] = Map(
    "q_percentiles" -> (qPercentiles _),
    "q_price_stats" -> (qPriceStats _),
    "q9_product_profit" -> (q9ProductProfit _),
    "q20_excess_supply" -> (q20ExcessSupply _),
    "q2_cheapest_part" -> (q2CheapestPart _),
    "q11_important_parts" -> (q11ImportantParts _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q16_supplier_counts" -> (q16SupplierCounts _),
    "q17_small_quantity" -> (q17SmallQuantity _),
    "q21_sole_supplier" -> (q21SoleSupplier _)
  )

  private val centsVol: String = Exact.volSql()

  val oracles: Map[String, String] = Map(
    "q_percentiles" ->
      s"""SELECT o_orderstatus,
         |  ${Exact.rndSql("quantile_cont(o_totalprice, 0.5)", 2)} AS p50,
         |  ${Exact.rndSql("quantile_cont(o_totalprice, 0.9)", 2)} AS p90,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM orders GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin,
    "q_price_stats" ->
      s"""WITH m AS (
         |  SELECT o_orderstatus,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(${Exact.centsSql("o_totalprice")}) AS DECIMAL(38,0)) AS s1,
         |    CAST(sum(CAST(${Exact.centsSql("o_totalprice")} AS DECIMAL(38,0)) *
         |             ${Exact.centsSql("o_totalprice")}) AS DECIMAL(38,0)) AS s2
         |  FROM orders GROUP BY o_orderstatus)
         |SELECT o_orderstatus, n,
         |  ${Exact.rndSql("CAST(s1 AS DOUBLE) / n / 100", 2)} AS mean,
         |  ${Exact.rndSql(
             "sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1)) / 100",
             2)} AS sd
         |FROM m ORDER BY o_orderstatus""".stripMargin,
    "q9_product_profit" ->
      s"""SELECT n_name, year(l_shipdate) AS o_year,
        |  ${Exact.rndSql(
              s"CAST(sum(${Exact.centsSql("l_extendedprice")} * (100 - ${Exact.centsSql("l_discount")}) * 10" +
              s" - ${Exact.centsSql("p_retailprice")} * ${Exact.centsSql("l_quantity")}) AS DOUBLE) / 1e5", 2)}
        |    AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2
        |ORDER BY n_name, o_year DESC""".stripMargin,
    "q20_excess_supply" ->
      """WITH pt AS (SELECT l_partkey, sum(CAST(floor(l_quantity) AS BIGINT)) AS tq
        |            FROM lineitem GROUP BY 1),
        |ps AS (SELECT l_partkey, l_suppkey, sum(CAST(floor(l_quantity) AS BIGINT)) AS sq
        |       FROM lineitem GROUP BY 1, 2)
        |SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM ps JOIN pt USING (l_partkey)
        |              WHERE ps.l_suppkey = s_suppkey AND 5 * sq > tq)
        |ORDER BY s_suppkey""".stripMargin,
    "q2_cheapest_part" ->
      """SELECT p_type, p_partkey, p_retailprice
        |FROM part
        |WHERE p_retailprice = (SELECT min(p2.p_retailprice) FROM part p2
        |                       WHERE p2.p_type = part.p_type)
        |ORDER BY p_type, p_partkey""".stripMargin,
    "q11_important_parts" ->
      s"""SELECT l_partkey,
        |  ${Exact.rndSql(s"CAST(sum($centsVol) AS DOUBLE) / 1e4", 2)} AS value
        |FROM lineitem
        |GROUP BY l_partkey
        |HAVING CAST(sum($centsVol) AS DOUBLE) >
        |  (SELECT CAST(sum($centsVol) AS DOUBLE) * 0.0008 FROM lineitem)
        |ORDER BY value DESC, l_partkey""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH rev AS (
        |  SELECT l_suppkey, sum($centsVol) AS total_u
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |  ${Exact.rndSql("CAST(total_u AS DOUBLE) / 1e4", 2)} AS total_rev
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_u = (SELECT max(total_u) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q16_supplier_counts" ->
      """SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand, p_type
        |ORDER BY supplier_cnt DESC, p_brand, p_type""".stripMargin,
    "q17_small_quantity" ->
      s"""SELECT ${Exact.rndSql(s"CAST(sum(${Exact.centsSql("l_extendedprice")}) AS DOUBLE) / 100 / 7.0", 2)} AS avg_yearly
        |FROM lineitem l1
        |JOIN (SELECT l_partkey, avg(l_quantity) * 0.5 AS half_avg
        |      FROM lineitem GROUP BY l_partkey) a
        |  ON l1.l_partkey = a.l_partkey
        |WHERE l1.l_quantity < a.half_avg""".stripMargin,
    "q21_sole_supplier" ->
      """WITH po AS (
        |  SELECT DISTINCT l_orderkey, l_suppkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |sole AS (
        |  SELECT l_orderkey, l_suppkey FROM po
        |  WHERE NOT EXISTS (SELECT 1 FROM po p2
        |                    WHERE p2.l_orderkey = po.l_orderkey
        |                      AND p2.l_suppkey <> po.l_suppkey))
        |SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM sole JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_suppkey, s_name
        |ORDER BY numwait DESC, s_suppkey""".stripMargin
  )
}
