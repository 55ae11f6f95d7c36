package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a subset of SparkEntry queries by name (same session
  * config as Bench) — `runMain graft.BenchOne lake_sql_merge q1_...`.
  * Warmup at sf0.001, then SPARK_GRAFT_BENCH_PASSES sweeps at
  * SPARK_GRAFT_SF_DIR, min per query, one line each. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // keep AQE's parallelism-first coalescing from SERIALIZING small
      // CPU-bound stages: the default 1 MB minPartitionSize floor wins
      // over the bytes/parallelism target on metadata-scale shuffles and
      // collapses window/sort/write stages to a handful of tasks; a 64k
      // floor still merges crumb partitions while the scale-adaptive
      // bytes/parallelism target governs real data (unchanged at scale)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      // Tungsten serialized shuffle for small reduce counts — one output
      // file per map task instead of numPartitions files (see Bench.scala)
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      // let AQE re-plan (coalesce) the output partitioning of CACHED
      // plans too: the engine pins hot intermediates (tag joins, shingle
      // frames), and without this every consumer of a cached frame
      // inherits the raw shuffle partition count however tiny the data —
      // scale-adaptive everywhere, not a local-mode tune
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .withExtensions(new graft.functions.GraftExtensions)
    // dev A/B hook: SPARK_GRAFT_CONF="k=v;k=v" overrides any config above
    val spark = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(';').toSeq).filter(_.contains('='))
      .foldLeft(builder0) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val picked = args.toSeq.map(n => n -> SparkEntry.queries.getOrElse(n,
      throw new IllegalArgumentException(s"unknown query $n")))
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    picked.foreach { case (_, fn) => fn(spark, warmDir).count() }
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    val times = (1 to passes).map { _ =>
      picked.map { case (name, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    picked.foreach { case (name, _) =>
      println(f"$name%-28s ${times.map(_.toMap.apply(name)).min}%.2f s")
    }
    spark.stop()
  }
}
