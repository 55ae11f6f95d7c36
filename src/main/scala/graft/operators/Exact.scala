package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

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
}
