package graft.pipeline

import com.fasterxml.jackson.databind.JsonNode
import graft.table.{CommitMeta, Timeline}

/**
 * Versioned metadata for the persisted pipeline indexes ([[AnnIndex]]'s
 * IVF-PQ and LSH, [[MinhashIndex]]) — the ONE pointer every index reader
 * resolves: the build parameters, the drift/occupancy baselines, and (for
 * a rebuilt index) the `v<N>` subdir the live tables occupy.
 *
 * The COMMIT POINT is the lake's own timeline protocol, not a file rename:
 * each meta write completes a `replacecommit` instant on the index root's
 * own timeline with the meta JSON in the instant's `extra` map, and readers
 * resolve the NEWEST completed instant. That matters at 100 TB scale
 * because the timeline protocol is append-only — committing is creating a
 * new instant object, which an object store does atomically — whereas
 * renaming a new JSON over `ivfpq_meta.json` relies on POSIX rename
 * atomicity that object stores do not provide. The legacy per-kind JSON
 * file is still written (atomically, best-effort) as a HUMAN-INSPECTABLE
 * CACHE and a downgrade/compat shim; no reader depends on it once a
 * timeline instant exists, and a pre-timeline index (legacy file only)
 * still loads. Spec-pinned: deleting or corrupting the legacy file after a
 * rebuild changes no query answer.
 *
 * Concurrency: version subdirs are allocated by EXCLUSIVE directory
 * create (two concurrent rebuilds get DIFFERENT `v<N>` dirs — neither can
 * write into the other's half-built table set), and the timeline's
 * exclusive inflight-file claim orders their meta commits — the newest
 * commit wins and the loser's version becomes unreferenced garbage that
 * [[vacuum]] reclaims. The remaining coordination rule is operational,
 * the same one table cleaning has with readers: vacuum's CADENCE must
 * trail in-flight WRITERS — an upsert that resolved the meta just before
 * a rebuild lands its rows in the superseded version, and a vacuum that
 * runs before that writer's corpus-vs-index gap is reconciled discards
 * them (the corpus stays the source of truth; `reconcile*` re-derives the
 * lost rows — spec-pinned end to end).
 *
 * Ref (behavior, not code): hudi-common .../HoodieActiveTimeline.java
 * (instant-file commit protocol), FAISS index versioning practice.
 */
private[pipeline] object IndexMeta {
  import java.nio.file.{Files, Path, Paths, StandardCopyOption}

  /** Commit `json` as the index's live meta: a `replacecommit` instant on
    * the index root's timeline (the atomic pointer swap — readers planned
    * before it keep the meta they resolved; readers after it see this
    * one), then the legacy `legacyName` cache file, best-effort. */
  def commit(indexDir: String, legacyName: String, json: String): Unit = {
    val tl = new Timeline(indexDir)
    tl.init()
    val instant = tl.startInstant("replacecommit")
    try tl.complete(CommitMeta(instant, "replacecommit", "index_meta",
      extra = Map("index_meta" -> json)))
    catch { case e: Throwable => tl.abort(instant, "replacecommit"); throw e }
    // cache/compat shim only: unique tmp name so concurrent committers
    // can't truncate each other's in-flight tmp; staleness here is
    // harmless — readers prefer the timeline
    try {
      val tmp = Paths.get(indexDir, s".$legacyName.$instant.tmp")
      Files.write(tmp, json.getBytes("UTF-8"))
      Files.move(tmp, Paths.get(indexDir, legacyName),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    } catch { case _: java.io.IOException => }
  }

  /** The live meta: the newest timeline-committed JSON, else the legacy
    * file (a pre-timeline index), else None (a pre-meta v1 index). ONE
    * parsed node serves a whole operation — callers resolve once so a
    * concurrent rebuild can never split one read or write across
    * versions. */
  def read(indexDir: String, legacyName: String): Option[JsonNode] = {
    val fromTimeline = {
      val tlDir = Paths.get(indexDir, ".graft", "timeline")
      if (!Files.isDirectory(tlDir)) None
      else {
        // newest-first over the LISTING, parsing lazily — a meta read
        // costs one instant-file read no matter how many rebuilds the
        // index has accumulated
        val tl = new Timeline(indexDir)
        tl.completed().reverseIterator
          .map { case (i, a) => tl.readSlim(i, a) }
          .flatMap(_.extra.get("index_meta")).nextOption()
          .map(graft.table.Json.mapper.readTree)
      }
    }
    fromTimeline.orElse {
      val p = Paths.get(indexDir, legacyName)
      if (!Files.exists(p)) None
      else Some(graft.table.Json.mapper.readTree(Files.readAllBytes(p)))
    }
  }

  /** Directory the live index tables occupy: the meta's `dir` subdir for
    * a rebuilt (versioned) index, the index root otherwise. */
  def liveRoot(indexDir: String, meta: Option[JsonNode]): String =
    meta.map(_.path("dir")).filter(!_.isMissingNode)
      .map(d => s"$indexDir/${d.asText}").getOrElse(indexDir)

  /** Names of `v<N>` version subdirs under the index root. */
  def versionDirs(indexDir: String): Seq[String] = {
    val d = Paths.get(indexDir)
    if (!Files.isDirectory(d)) Nil
    else {
      val s = Files.list(d)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.matches("v\\d+")).toList
      } finally s.close()
    }
  }

  /** Allocate the next `v<N>` version subdir by EXCLUSIVE create —
    * starting past every existing dir (a crashed rebuild's orphan must
    * never be re-entered: it may hold a half-built table set) and
    * retrying upward on a concurrent winner, the same optimistic claim
    * the timeline uses for instants. */
  def allocateVersion(indexDir: String): String = {
    Files.createDirectories(Paths.get(indexDir))
    var n = versionDirs(indexDir).map(_.drop(1).toInt).foldLeft(0)(math.max) + 1
    while (true) {
      try { Files.createDirectory(Paths.get(indexDir, s"v$n")); return s"v$n" }
      catch { case _: java.nio.file.FileAlreadyExistsException => n += 1 }
    }
    sys.error("unreachable")
  }

  /** Reclaim index versions the meta no longer points at — the cleanup
    * policy rebuilds defer. Drops every non-live version subdir AND the
    * root table set once a versioned dir is live (the root is stale if
    * ANY of its table dirs survives — a previous vacuum crash that got
    * through some of them must not hide the rest forever). Returns the
    * number of table sets dropped. */
  def vacuum(indexDir: String, legacyName: String,
      tables: Seq[String]): Int = {
    val live = liveRoot(indexDir, read(indexDir, legacyName))
    val staleVersions =
      versionDirs(indexDir).map(v => s"$indexDir/$v").filterNot(_ == live)
    val staleRoot =
      if (live != indexDir &&
          tables.exists(t => Files.exists(Paths.get(indexDir, t))))
        Seq(indexDir)
      else Nil
    val doomed = staleVersions ++ staleRoot
    doomed.foreach { root =>
      tables.foreach { t =>
        val p = Paths.get(root, t)
        if (Files.exists(p)) graft.table.GraftTable.drop(p.toString)
      }
      if (root != indexDir) // version subdir itself (root keeps the meta)
        Files.deleteIfExists(Paths.get(root))
    }
    // the meta timeline is vacuum's to bound too: keep the newest
    // KeepMetaInstants commits (readers resolve only the newest; the rest
    // are debugging history, the same trade table archival makes)
    if (Files.isDirectory(Paths.get(indexDir, ".graft", "timeline"))) {
      val tl = new Timeline(indexDir)
      tl.completed().dropRight(KeepMetaInstants)
        .foreach { case (i, a) => tl.remove(i, a) }
    }
    doomed.size
  }

  /** Meta commits [[vacuum]] retains beyond the live one. */
  private val KeepMetaInstants = 10

  /** One row per version root still on disk: (version name — "root" or
    * "v<N>" —, is the live one, has a COMPLETE table set, total bytes).
    * The ops introspection behind `CALL show_index_versions`: what would
    * a vacuum reclaim, did a crashed rebuild leave an orphan, how much
    * disk does each version hold. Driver-side directory walk —
    * file-count-scale, the same class as a table's file listing. */
  def versions(indexDir: String,
      legacyName: String, tables: Seq[String]): Seq[(String, Boolean, Boolean, Long)] = {
    val live = liveRoot(indexDir, read(indexDir, legacyName))
    val roots = (indexDir, "root") +:
      versionDirs(indexDir).sorted.map(v => (s"$indexDir/$v", v))
    roots.flatMap { case (root, name) =>
      val present = tables.filter(t => Files.exists(Paths.get(root, t)))
      // the root row only exists while it HOLDS tables (or is live):
      // after a vacuum it's just the meta's mailbox, not a version
      if (present.isEmpty && root != live) None
      else {
        val bytes = present.map { t =>
          graft.table.Fs.walk(Paths.get(root, t))
            .filter(Files.isRegularFile(_)).map(Files.size).sum
        }.sum
        Some((name, root == live, present.size == tables.size, bytes))
      }
    }
  }

  /** Bucket-occupancy report for the train-free indexes (MinHash bands /
    * LSH tables) — their analog of [[AnnIndex.driftStats]]'s "recall is
    * silently decaying": the hyperplane/band count was sized for the
    * corpus at build time, so a corpus that outgrew it shows up as
    * ballooning rows-per-bucket — every probe's candidate set (and the
    * verify join behind it) grows with the hot buckets. `ratio` =
    * p99(rows per (partition, bucket) group) now / at build — the
    * WHEN-to-rebuild signal (rebuild with more bands/planes re-shrinks
    * the buckets). None when the index predates the baseline or the
    * index is empty. */
  case class OccupancyStats(buckets: Long, mean: Double, p99: Double,
      max: Long, buildP99: Option[Double], ratio: Option[Double])

  /** (groups, mean, p99, max) of rows-per-(partCol, bucket) group over
    * `rows` — shared by the build (baseline, observed over the
    * just-written table) and [[occupancyStats]] (current). One
    * column-pruned aggregate: the two grouping columns only, never text
    * or vectors. Returns None for an empty index. */
  def occupancyOf(rows: org.apache.spark.sql.DataFrame,
      partCol: String): Option[(Long, Double, Double, Long)] = {
    import org.apache.spark.sql.functions._
    val r = rows.groupBy(col(partCol), col("bucket")).count()
      .agg(count(lit(1)).as("groups"), avg("count").as("mean"),
        percentile_approx(col("count"), lit(0.99), lit(10000)).as("p99"),
        max("count").as("max"))
      .head()
    if (r.getLong(0) == 0L) None
    else Some((r.getLong(0), r.getDouble(1), r.getLong(2).toDouble,
      r.getLong(3)))
  }

  /** The occupancy JSON fields a build appends to its meta (empty for an
    * empty build — an honest no-baseline, mirroring the NaN train_err
    * path). A non-finite mean (cannot happen from counts, but the meta
    * must never hold invalid JSON) also records nothing. */
  def occupancyJson(occ: Option[(Long, Double, Double, Long)]): String =
    occ.collect { case (_, mean, p99, mx)
        if java.lang.Double.isFinite(mean) =>
      s""","occ_mean":$mean,"occ_p99":$p99,"occ_max":$mx"""
    }.getOrElse("")

  /** [[OccupancyStats]] of a live buckets table vs the meta's build-time
    * baseline. */
  def occupancyStats(rows: org.apache.spark.sql.DataFrame, partCol: String,
      meta: Option[JsonNode]): OccupancyStats = {
    val base = meta.map(_.path("occ_p99")).filter(!_.isMissingNode)
      .map(_.asDouble)
    occupancyOf(rows, partCol) match {
      case Some((groups, mean, p99, mx)) =>
        OccupancyStats(groups, mean, p99, mx, base,
          base.map(b => if (b > 0) p99 / b
            else if (p99 == 0) 1.0 else Double.PositiveInfinity))
      // an EMPTY index measured nothing: ratio None, never "healthy"
      case None => OccupancyStats(0L, 0.0, 0.0, 0L, base, None)
    }
  }
}
