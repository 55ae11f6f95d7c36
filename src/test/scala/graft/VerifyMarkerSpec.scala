package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** A query that crashes must still leave a row in the correctness gate:
  * Verify.dumpOne writes a `_graft_error` parquet on failure so the driver
  * records a schema-mismatching failure instead of a silent absence
  * (the round-6 q_events_sessions failure mode). */
class VerifyMarkerSpec extends AnyFunSuite {
  import TestSpark._

  test("a deliberately broken query still writes a failure-marker parquet") {
    val out = Files.createTempDirectory("graft_verify_marker").toString
    val err = Verify.dumpOne(spark, "boom",
      (_, _) => throw new IllegalStateException("deliberate"), sf, out)
    assert(err.exists(_.contains("deliberate")))
    val df = spark.read.parquet(s"$out/boom")
    assert(df.columns.toSeq == Seq("_graft_error"))
    assert(df.count() == 1)
  }

  test("a healthy query writes its result, no marker") {
    val out = Files.createTempDirectory("graft_verify_ok").toString
    val err = Verify.dumpOne(spark, "ok",
      (s, d) => s.read.parquet(s"$d/region.parquet"), sf, out)
    assert(err.isEmpty)
    assert(spark.read.parquet(s"$out/ok").count() > 0)
  }
}
