package graft.table

/**
 * Driver-side string comparison matching the order the recorded stats were
 * computed under. Spark's string min/max (UTF8String) and parquet footer
 * binary stats both order by unsigned UTF-8 byte — equivalently, by Unicode
 * CODE POINT — while Java's `String.compareTo` orders by UTF-16 code unit.
 * The two disagree exactly when supplementary-plane characters (surrogate
 * pairs, e.g. emoji) meet BMP characters in [U+E000, U+FFFF]: UTF-16 sorts
 * the surrogate range (0xD800–0xDFFF) below them, code-point order above.
 * Comparing recorded extremes with `String`'s order could then wrongly
 * exclude a file from tagging candidates — a silent duplicate-key bug —
 * so every driver-side comparison against recorded stats routes here.
 */
private[graft] object CodePointOrder {
  def le(a: String, b: String): Boolean = compare(a, b) <= 0

  def compare(a: String, b: String): Int = {
    val la = a.length
    val lb = b.length
    var i = 0
    // a single index suffices: the loop only advances past EQUAL code
    // points, which occupy the same number of chars in both strings
    while (i < la && i < lb) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(i)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
    }
    Integer.compare(la, lb)
  }
}
