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
  /** Re-verify (from inside `withLock`) that the calling thread still holds
    * the lock — called by writers immediately before the irreversible
    * timeline-complete step. No-op for backends that cannot lose a held
    * lock (in-process monitor, ZooKeeper ephemeral nodes). */
  def assertHeld(): Unit = ()
}

/** Mutual exclusion via atomic lock-file creation under `.graft/.lock` —
  * correct across processes on any filesystem with atomic create (the
  * reference's FileSystemBasedLockProvider approach). A lock older than
  * `staleMs` is presumed abandoned (crashed writer) and broken.
  *
  * Ownership is token-based: the holder writes a unique token after
  * creating the file and releases only a lock that still carries its
  * token — a holder whose lock was stale-broken while it ran cannot
  * delete the new holder's lock. Stale-breaking uses an atomic RENAME to
  * a tombstone (exactly one of N waiters wins the rename; the others'
  * moves fail), so a freshly re-created lock can never be deleted by a
  * waiter acting on a stale observation.
  *
  * A held lock is HEARTBEATED: a daemon thread refreshes the file's mtime
  * every staleMs/4 for as long as the critical section runs, so a live
  * holder's lock never ages into stale-break territory — critical sections
  * are NOT bounded by staleMs. The residual exposure is a clock jump (or a
  * heartbeat thread starved for >staleMs), and writers additionally
  * re-verify their token via [[assertHeld]] before the irreversible
  * timeline write. */
class FileLockProvider(baseDir: String, timeoutMs: Long = 60000,
    pollMs: Long = 10, staleMs: Long = 10 * 60 * 1000) extends LockProvider {
  private val lockPath = Paths.get(baseDir, ".graft", ".lock")
  private val heldToken = new ThreadLocal[String]

  override def assertHeld(): Unit = {
    val token = heldToken.get
    val owner =
      try new String(Files.readAllBytes(lockPath), "UTF-8")
      catch { case _: java.io.IOException => null }
    if (token == null || owner != token)
      throw new ConcurrentWriteException(
        s"commit lock no longer held (owner=$owner): $lockPath")
  }

  /** Refresh the lock's mtime while held; only ever touches a file that
    * still carries OUR token (read-then-touch races at worst extend a
    * successor's lock by one period — safe, never breaks exclusion). */
  private def startHeartbeat(token: String): Thread = {
    val t = new Thread(() => {
      val period = math.max(pollMs, staleMs / 4)
      try while (!Thread.interrupted()) {
        Thread.sleep(period)
        try {
          if (new String(Files.readAllBytes(lockPath), "UTF-8") == token)
            Files.setLastModifiedTime(lockPath,
              java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
        } catch { case _: java.io.IOException => /* broken/released; keep checking */ }
      } catch { case _: InterruptedException => /* released */ }
    }, "graft-lock-heartbeat")
    t.setDaemon(true)
    t.start()
    t
  }

  def withLock[T](f: => T): T = {
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + timeoutMs
    var held = false
    while (!held) {
      try {
        Files.createDirectories(lockPath.getParent)
        Files.createFile(lockPath)
        // not atomic with create, but the token is only consulted on
        // RELEASE: worst case an un-tokened lock is treated as not-ours
        // and left for the stale-breaker
        Files.write(lockPath, token.getBytes("UTF-8"))
        held = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          try {
            val age = System.currentTimeMillis() -
              Files.getLastModifiedTime(lockPath).toMillis
            if (age > staleMs) {
              // atomic break: whoever wins this rename owns the cleanup;
              // a fresh lock re-created meanwhile keeps its path untouched
              val tomb = lockPath.resolveSibling(
                s".lock.stale-${System.nanoTime()}")
              Files.move(lockPath, tomb)
              // the age observation raced the move: if what we displaced is
              // actually FRESH (released + re-created in between), put it
              // back; best-effort — if a third writer locked meanwhile, the
              // displaced holder is still release-safe via its token
              val tombAge = System.currentTimeMillis() -
                Files.getLastModifiedTime(tomb).toMillis
              if (tombAge <= staleMs) {
                try Files.move(tomb, lockPath)
                catch { case _: java.io.IOException => Files.deleteIfExists(tomb) }
              } else Files.deleteIfExists(tomb)
            }
          } catch { case _: java.io.IOException => /* raced; retry */ }
          if (System.currentTimeMillis() > deadline)
            throw new ConcurrentWriteException(
              s"could not acquire commit lock within ${timeoutMs}ms: $lockPath")
          Thread.sleep(pollMs)
      }
    }
    heldToken.set(token)
    val beat = startHeartbeat(token)
    try f finally {
      beat.interrupt()
      heldToken.remove()
      // release only if the lock is still ours (it may have been
      // stale-broken and re-acquired by another writer while f ran)
      try {
        val owner = new String(Files.readAllBytes(lockPath), "UTF-8")
        if (owner == token) Files.deleteIfExists(lockPath)
      } catch { case _: java.io.IOException => /* already broken/released */ }
    }
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
