package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The defining Hilbert-curve properties, checked exhaustively on a 16×16
  * grid: xy2d is a bijection onto [0, n²) and consecutive curve positions
  * are always grid-adjacent (|Δx|+|Δy| = 1 — the locality guarantee that
  * makes Hilbert clustering strictly better than Morton for range scans). */
class HilbertSpec extends AnyFunSuite {

  test("xy2d is a bijection with unit-adjacent consecutive cells (n=16)") {
    val n = 16
    val cells = (for (x <- 0 until n; y <- 0 until n)
      yield Hilbert.xy2d(n, x, y) -> (x, y)).toMap
    assert(cells.size === n * n)
    assert(cells.keys.forall(d => d >= 0 && d < n * n))
    for (d <- 0L until (n * n - 1).toLong) {
      val (x1, y1) = cells(d)
      val (x2, y2) = cells(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"jump between d=$d ($x1,$y1) and d=${d + 1} ($x2,$y2)")
    }
  }

  test("index16 spans the full 65536-grid and matches xy2d") {
    assert(Hilbert.index16(0L, 0L) === 0L)
    // corners land inside [0, 2^32)
    for ((x, y) <- Seq((65535L, 0L), (0L, 65535L), (65535L, 65535L)))
      assert(Hilbert.index16(x, y) >= 0L && Hilbert.index16(x, y) < (1L << 32))
    assert(Hilbert.index16(123L, 456L) === Hilbert.xy2d(65536L, 123L, 456L))
  }

  test("cluster(curve = hilbert) lays out data and preserves every row") {
    import graft.{Tables, TestSpark}
    import graft.table._
    import org.apache.spark.sql.functions._
    import TestSpark.{spark, sf}
    val dir = java.nio.file.Files.createTempDirectory("graft_hilbert_").toString
    val t = GraftTable.create(spark, dir, TableConfig("hil", CopyOnWrite,
      keyFields = Seq("o_orderkey"),
      partitioning = PartitionByColumns(Seq("o_orderstatus")),
      targetFileSizeRows = 300))
    val orders = Tables.orders(spark, sf)
    t.bulkInsert(orders)
    val Some(_) = t.cluster(Seq("o_orderkey", "o_custkey"), zorder = true,
      curve = "hilbert"): @unchecked
    assert(t.snapshot().count() === orders.count())
    assert(t.snapshot().agg(sum("o_orderkey")).collect()(0).getLong(0)
      === orders.agg(sum("o_orderkey")).collect()(0).getLong(0))
    // the rewrite produced clustered file groups
    assert(t.slices(None).exists(_.fileId.startsWith("c")))
    intercept[IllegalArgumentException](
      t.cluster(Seq("o_orderkey", "o_custkey"), zorder = true, curve = "bogus"))
    GraftTable.drop(dir)
  }
}
