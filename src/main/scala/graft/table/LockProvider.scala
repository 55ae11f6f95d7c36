package graft.table

import java.nio.file.{Files, Paths}

/**
 * Pluggable commit-time lock (ref: hudi-client-common
 * .../lock/LockProvider.java + FileSystemBasedLockProvider). Held around the
 * [conflict-check, timeline-complete] window so that two optimistic writers
 * can never both pass the check and then both commit conflicting changes.
 *
 * On a real cluster this would be backed by ZooKeeper/DynamoDB/Hive-metastore
 * (the reference ships those providers); the semantics Graft needs is just
 * `withLock` mutual exclusion, so any such backend drops in.
 */
trait LockProvider {
  def withLock[T](f: => T): T
}

/** Mutual exclusion via atomic lock-file creation under `.graft/.lock` —
  * correct across processes on any filesystem with atomic create (the
  * reference's FileSystemBasedLockProvider approach). A lock older than
  * `staleMs` is presumed abandoned (crashed writer) and broken. */
class FileLockProvider(baseDir: String, timeoutMs: Long = 60000,
    pollMs: Long = 10, staleMs: Long = 10 * 60 * 1000) extends LockProvider {
  private val lockPath = Paths.get(baseDir, ".graft", ".lock")

  def withLock[T](f: => T): T = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var held = false
    while (!held) {
      try {
        Files.createDirectories(lockPath.getParent)
        Files.createFile(lockPath)
        held = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          try {
            val age = System.currentTimeMillis() -
              Files.getLastModifiedTime(lockPath).toMillis
            if (age > staleMs) Files.deleteIfExists(lockPath)
          } catch { case _: java.io.IOException => /* raced with release */ }
          if (System.currentTimeMillis() > deadline)
            throw new ConcurrentWriteException(
              s"could not acquire commit lock within ${timeoutMs}ms: $lockPath")
          Thread.sleep(pollMs)
      }
    }
    try f finally Files.deleteIfExists(lockPath)
  }
}

/** In-process lock for single-JVM multi-threaded writers (tests, local
  * pipelines): one JVM-wide monitor per table path. */
class InProcessLockProvider(baseDir: String) extends LockProvider {
  private val monitor = InProcessLockProvider.monitorFor(baseDir)
  def withLock[T](f: => T): T = monitor.synchronized(f)
}

object InProcessLockProvider {
  private val monitors = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def monitorFor(path: String): Object =
    monitors.computeIfAbsent(
      Paths.get(path).toAbsolutePath.normalize.toString, _ => new Object)
}
