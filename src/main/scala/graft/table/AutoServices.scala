package graft.table

/**
 * Automatic table services on the batch write door — the reference's
 * default operating mode, where every writer maintains its own table
 * (ref: hudi-client-common/src/main/java/org/apache/hudi/config/
 * HoodieCompactionConfig.java `hoodie.compact.inline` /
 * `hoodie.compact.schedule.inline` / `hoodie.compact.inline.max.delta.commits`,
 * HoodieClusteringConfig.java `hoodie.clustering.inline` /
 * `hoodie.clustering.inline.max.commits`, HoodieCleanConfig.java
 * `hoodie.clean.automatic` / `hoodie.cleaner.commits.retained`,
 * HoodieArchivalConfig.java `hoodie.archive.automatic` /
 * `hoodie.keep.max.commits` / `hoodie.keep.min.commits`).
 *
 * Triggers are counted from timeline ACTIONS, never a data scan:
 *  - compaction fires when the trailing run of deltacommits since the last
 *    compaction (completed `op=compact` commit or pending `compactionreq`
 *    plan) reaches `max.delta.commits` — the reference's
 *    ScheduleCompactionActionExecutor NUM_COMMITS trigger;
 *  - clustering fires when data commits since the last replacecommit or
 *    pending clustering plan reach `max.commits`;
 *  - archival fires when completed data instants exceed `keep.max.commits`
 *    and trims to `keep.min.commits`.
 *
 * Posture divergence, deliberate: the reference defaults `clean.automatic`
 * and `archive.automatic` ON; graft keeps every automatic service OPT-IN —
 * deleting files behind the user's back is never a default (same stance as
 * the streaming sink's `ignore.failed.batch`). Inline compaction defaults
 * off in the reference too.
 *
 * At 100 TB the intended mode is `compact.schedule.inline=true`: the ingest
 * writer pays one metadata listing per trigger; the rewrite IO runs
 * out-of-band via `run_compaction(op => 'run')` or the async service
 * thread. Fully-inline compaction is for small/medium tables where one
 * writer owns everything.
 */
object AutoServices {
  // (ref: hoodie.compact.inline — execute inline when the trigger fires)
  val COMPACT_INLINE = "graft.compact.inline"
  // (ref: hoodie.compact.schedule.inline — only PLAN inline; execution is
  //  out-of-band. Mutually exclusive with compact.inline; schedule wins.)
  val COMPACT_SCHEDULE_INLINE = "graft.compact.schedule.inline"
  // (ref: hoodie.compact.inline.max.delta.commits, default 5)
  val COMPACT_MAX_DELTA_COMMITS = "graft.compact.inline.max.delta.commits"
  // (ref: hoodie.clustering.inline)
  val CLUSTER_INLINE = "graft.clustering.inline"
  // (ref: hoodie.clustering.inline.max.commits, default 4)
  val CLUSTER_MAX_COMMITS = "graft.clustering.inline.max.commits"
  // (ref: hoodie.clustering.plan.strategy.sort.columns)
  val CLUSTER_SORT_COLS = "graft.clustering.sort.columns"
  // (ref: hoodie.clean.automatic — graft default FALSE, see scaladoc)
  val CLEAN_AUTOMATIC = "graft.clean.automatic"
  // (ref: hoodie.cleaner.commits.retained, default 10)
  val CLEAN_RETAIN_COMMITS = "graft.clean.commits.retained"
  // (ref: hoodie.archive.automatic — graft default FALSE, see scaladoc)
  val ARCHIVE_AUTOMATIC = "graft.archive.automatic"
  // (ref: hoodie.keep.max.commits, default 30)
  val ARCHIVE_KEEP_MAX = "graft.keep.max.commits"
  // (ref: hoodie.keep.min.commits, default 20)
  val ARCHIVE_KEEP_MIN = "graft.keep.min.commits"

  private val dataActions = Set("commit", "deltacommit", "replacecommit")

  /** Deltacommits since the last compaction boundary: a pending
    * `compactionreq` plan or a completed commit whose op is `compact`
    * resets the count (ref: CompactionUtils.getDeltaCommitsSinceLatestCompaction).
    * Scans the action list backward; commit metas are read only for the
    * few `commit` instants encountered before a boundary. */
  def deltaCommitsSinceCompaction(t: GraftTable): Int = {
    var n = 0
    for ((instant, action) <- t.timeline.completed().reverse) action match {
      case "deltacommit" => n += 1
      case "compactionreq" => return n
      case "commit" =>
        if (t.timeline.read(instant, "commit").operation == "compact") return n
      case _ => ()
    }
    n
  }

  /** Data commits since the last clustering boundary (replacecommit or
    * pending clustering plan). */
  def commitsSinceClustering(t: GraftTable): Int = {
    var n = 0
    for ((_, action) <- t.timeline.completed().reverse) action match {
      case "replacecommit" | "clusteringreq" => return n
      case a if dataActions(a) => n += 1
      case _ => ()
    }
    n
  }

  /** Run whichever automatic services the write options enable. Called by
    * the write door after each completed write; service failures propagate
    * (a half-maintained table must surface, not rot silently). */
  def run(t: GraftTable, opts: Map[String, String]): Unit = {
    def bool(k: String): Boolean = opts.get(k).exists(_.toBoolean)
    def int(k: String, dflt: Int): Int = opts.get(k).map(_.toInt).getOrElse(dflt)

    val scheduleInline = bool(COMPACT_SCHEDULE_INLINE)
    if ((scheduleInline || bool(COMPACT_INLINE)) &&
        t.config.tableType == MergeOnRead &&
        deltaCommitsSinceCompaction(t) >= int(COMPACT_MAX_DELTA_COMMITS, 5)) {
      if (scheduleInline) t.scheduleCompaction()
      else t.compact()
    }

    if (bool(CLUSTER_INLINE) &&
        commitsSinceClustering(t) >= int(CLUSTER_MAX_COMMITS, 4)) {
      val sortCols = opts.getOrElse(CLUSTER_SORT_COLS, throw new IllegalArgumentException(
        s"$CLUSTER_INLINE=true requires $CLUSTER_SORT_COLS (comma-separated)"))
        .split(',').map(_.trim).filter(_.nonEmpty).toSeq
      t.cluster(sortCols)
    }

    if (bool(CLEAN_AUTOMATIC))
      t.clean(KeepLatestCommits(int(CLEAN_RETAIN_COMMITS, 10)))

    if (bool(ARCHIVE_AUTOMATIC)) {
      val keepMax = int(ARCHIVE_KEEP_MAX, 30)
      val keepMin = int(ARCHIVE_KEEP_MIN, 20)
      require(keepMin <= keepMax,
        s"$ARCHIVE_KEEP_MIN ($keepMin) must be <= $ARCHIVE_KEEP_MAX ($keepMax)")
      val live = t.timeline.completed().count { case (_, a) => dataActions(a) }
      if (live > keepMax) t.archive(keepLast = keepMin)
    }
  }
}
