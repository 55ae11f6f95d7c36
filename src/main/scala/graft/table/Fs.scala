package graft.table

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/**
 * Directory listing/walking with the underlying stream CLOSED before
 * returning. `Files.list`/`Files.walk` each hold an OS file descriptor
 * until the stream is closed — and the JDK only closes unreferenced
 * streams at GC time, so hot paths (timeline refresh under concurrent
 * writers, per-commit staging promotion) leak fds until the process
 * trips "Too many open files". Every directory enumeration in graft
 * goes through these.
 */
private[graft] object Fs {

  /** Immediate children of `dir`, stream closed. */
  def list(dir: Path): Vector[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.toVector finally s.close()
  }

  /** Recursive walk of `dir` (including itself), stream closed. */
  def walk(dir: Path): Vector[Path] = {
    val s = Files.walk(dir)
    try s.iterator().asScala.toVector finally s.close()
  }

  /** True when `dir` has no children (directory-emptiness probe that
    * does not leak the listing stream). */
  def isEmptyDir(dir: Path): Boolean = {
    val s = Files.list(dir)
    try !s.iterator().hasNext finally s.close()
  }
}
