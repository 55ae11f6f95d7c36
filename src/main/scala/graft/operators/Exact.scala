package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit, sum}

/**
 * Engine-agnostic rounding. Spark's round() (BigDecimal HALF_UP on the
 * shortest decimal repr) and DuckDB's round() (multiply, round half away,
 * divide) disagree when a value's decimal form lands exactly on .xx5 —
 * which group sums of 2-decimal money values hit constantly. floor(x·10^k
 * + 0.5)/10^k is computed identically by both engines given identical
 * input doubles, so oracle comparisons stay bit-exact by construction.
 */
object Exact {
  def rnd(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    floor(c * f + 0.5) / f
  }

  /** DuckDB twin of [[rnd]] for oracle SQL strings. */
  def rndSql(expr: String, scale: Int): String = {
    val f = math.pow(10, scale).toLong
    s"floor(($expr) * $f + 0.5) / $f"
  }

  // ---- order-independent money aggregation -------------------------------
  //
  // Group sums of money doubles are fragile: each engine folds partitions in
  // its own order, and FP addition is non-associative, so two correct sums
  // can land on opposite sides of a rounding boundary. Snapping 2-decimal
  // inputs to integer cents FIRST makes the sum a long (associative, exact);
  // the division back to dollars is then computed from identical integers on
  // both engines. Every helper here has a `...Sql` twin that mirrors the
  // expression shape operation-for-operation — the mirroring is what makes
  // the comparison bit-exact, so change both or neither.

  /** 2-decimal money double -> integer cents (exact snap). */
  def cents(c: Column): Column = floor(c * 100 + lit(0.5)).cast("long")

  def centsSql(e: String): String = s"CAST(floor(($e) * 100 + 0.5) AS BIGINT)"

  /** Exact sum of a 2-decimal money column, back in dollars. */
  def sumMoney(c: Column): Column = sum(cents(c)).cast("double") / 100

  def sumMoneySql(e: String): String =
    s"CAST(sum(${centsSql(e)}) AS DOUBLE) / 100"

  /** Exact sum of price*(1-disc): integer 10^-4-dollar units. */
  def sumRevenue(price: Column, disc: Column): Column =
    sum(cents(price) * (lit(100L) - cents(disc))).cast("double") / lit(1e4)

  def sumRevenueSql(p: String, d: String): String =
    s"CAST(sum(${volSql(p, d)}) AS DOUBLE) / 1e4"

  /** price*(1-disc) as integer 10^-4-dollar units (the one SQL spelling of
    * the revenue-volume shape — q7/q8/q9/q11/q14/q15 all reuse it). */
  def volSql(p: String = "l_extendedprice", d: String = "l_discount"): String =
    s"${centsSql(p)} * (100 - ${centsSql(d)})"

  /** Exact sum of price*disc (TPC-H Q6 form). */
  def sumPriceTimes(price: Column, frac: Column): Column =
    sum(cents(price) * cents(frac)).cast("double") / lit(1e4)

  def sumPriceTimesSql(p: String, f: String): String =
    s"CAST(sum(${centsSql(p)} * ${centsSql(f)}) AS DOUBLE) / 1e4"

  /** Exact sum of price*(1-disc)*(1+tax): integer 10^-6-dollar units. */
  def sumCharge(price: Column, disc: Column, tax: Column): Column =
    sum(cents(price) * (lit(100L) - cents(disc)) * (lit(100L) + cents(tax)))
      .cast("double") / lit(1e6)

  def sumChargeSql(p: String, d: String, t: String): String =
    s"CAST(sum(${centsSql(p)} * (100 - ${centsSql(d)}) * (100 + ${centsSql(t)})) AS DOUBLE) / 1e6"
}
