package graft.table

/**
 * Post-commit callback (ref: hudi-client-common/src/main/java/org/apache/
 * hudi/callback/HoodieWriteCommitCallback.java, options
 * `hoodie.write.commit.callback.on` / `.callback.class`): invoked after a
 * write's instant completes, with the commit metadata. The reference ships
 * HTTP and Kafka implementations of the same single-method interface;
 * implementations here are user classes with a no-arg constructor, named
 * via `graft.commit.callback.class` on the write door. Callback failures
 * PROPAGATE (as the reference's do): a pipeline that requested
 * notification must not silently lose it — the commit itself is already
 * durable at that point, so the retry is the caller's replay.
 */
trait CommitCallback {
  def onCommit(tablePath: String, meta: CommitMeta): Unit
}

/** File-based callback for auditable pipelines: appends one JSON line per
  * commit to `<table>/.graft/commit_callbacks.log` (the shape the
  * reference's HTTP callback POSTs, durably on local storage instead). */
class FileCommitCallback extends CommitCallback {
  override def onCommit(tablePath: String, meta: CommitMeta): Unit = {
    val line = Json.mapper.writeValueAsString(Map(
      "instant" -> meta.instant, "action" -> meta.action,
      "operation" -> meta.operation,
      "files" -> meta.files.size, "replaced" -> meta.replaced.size)) + "\n"
    val p = java.nio.file.Paths.get(tablePath, ".graft", "commit_callbacks.log")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, line.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    ()
  }
}

object CommitCallback {
  /** Instantiate + fire the configured callback for `instant`, if any. */
  def fire(className: Option[String], t: GraftTable, instant: String): Unit =
    className.filter(_.nonEmpty).foreach { cls =>
      val cb = Class.forName(cls).getDeclaredConstructor()
        .newInstance().asInstanceOf[CommitCallback]
      t.timeline.refresh()
      val action = t.timeline.completed().find(_._1 == instant).map(_._2)
        .getOrElse(throw new IllegalStateException(
          s"commit callback: instant $instant not found on the timeline"))
      cb.onCommit(t.basePath, t.timeline.read(instant, action))
    }
}
