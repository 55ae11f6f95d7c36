package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler — DELETE before round end. Times the slow lake queries
  * individually at a given SF with per-phase breakdowns. */
object ProfileLake {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // warmup
    table.LakeQueries.lakeInsertOverwrite(spark, "/root/testdata/sf0.001").count()
    table.LakeQueries.lakeMergeInto(spark, "/root/testdata/sf0.001").count()
    table.LakeQueries.lakeCdc(spark, "/root/testdata/sf0.001").count()

    for (q <- args.drop(1).headOption.map(Seq(_)).getOrElse(
        Seq("lake_insert_overwrite", "lake_merge_into", "lake_cdc", "lake_upsert_snapshot"))) {
      time(q) { table.LakeQueries.all(q)(spark, sfDir).count() }
    }
    spark.stop()
  }
}
