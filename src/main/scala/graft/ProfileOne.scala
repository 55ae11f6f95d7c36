package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: run one SparkEntry query (same session config as Bench) with a
  * listener that prints every Spark job's wall time, stage task-time and
  * description — attributes a slow query's seconds to its jobs.
  * `runMain graft.ProfileOne lake_upsert_snapshot` (SPARK_GRAFT_SF_DIR
  * selects the data dir, default sf0.1; first run is warmup at sf0.001,
  * second is the reported one). */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
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
      // small-reduce-side SQL shuffles route to the Tungsten serialized
      // shuffle writer (ONE output file per map task) instead of the
      // bypass-merge writer (numPartitions files per map task + an NIO
      // concat): stack sampling showed shuffle-file creation as the top
      // runnable frame across the lake/index write paths
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String, Int)]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, Int, Double, String)]()
    val stageTask = new java.util.concurrent.atomic.AtomicLong(0)
    var enabled = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (enabled) {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.put(js.jobId, (js.time, desc, js.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (enabled) {
        Option(jobs.get(je.jobId)).foreach { case (t0, desc, nt) =>
          done.add((je.jobId, (je.time - t0) / 1e3, desc, nt))
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (enabled) {
          stageTask.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
          val si = sc.stageInfo
          val wall = (for (a <- si.completionTime; b <- si.submissionTime)
            yield (a - b) / 1e3).getOrElse(-1.0)
          stages.add((si.stageId, wall, si.numTasks,
            si.taskMetrics.executorRunTime / 1e3, si.name))
        }
    })
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      fn(spark, warmDir).count() // warmup: JIT + codegen
      fn(spark, sfDir).count()   // first sf pass absorbs sf-shape codegen
      enabled = true; jobs.clear(); done.clear(); stages.clear(); stageTask.set(0)
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      enabled = false
      println(f"========== $name: $wall%.2f s wall, $rows rows, " +
        f"${done.size} jobs, ${stageTask.get / 1e3}%.1f s task-time ==========")
      import scala.jdk.CollectionConverters._
      val byId = done.asScala.toSeq.sortBy(_._1)
      val totalJob = byId.map(_._2).sum
      println(f"  sum(job wall) = $totalJob%.2f s; gap (driver-side) = ${wall - totalJob}%.2f s")
      byId.foreach { case (id, sec, desc, nt) =>
        println(f"  job $id%3d  $sec%6.3f s  $nt%4d tasks  ${desc.take(110)}")
      }
      println("  -- slowest stages (wall s / tasks / task-time s / site) --")
      stages.asScala.toSeq.sortBy(-_._2).take(20).foreach {
        case (id, wall, nt, tt, nm) =>
          println(f"  stage $id%4d  $wall%6.3f s  $nt%4d t  $tt%6.1f tt  ${nm.take(100)}")
      }
    }
    spark.stop()
  }
}
