package graft.table

import java.io.OutputStreamWriter
import java.net.Socket
import java.time.{LocalDateTime, ZoneOffset}

/** One write metric sample: a dotted path, a value, and the COMMIT's
  * timestamp (derived from the instant, so reports are replayable and
  * identical from any process — the registry is the timeline, not a JVM).
  */
case class MetricPoint(path: String, value: Long, epochSeconds: Long)

/**
 * Metrics reporter surface (ref: hudi-client-common metrics/
 * MetricsReporter.java + MetricsReporterType): the reference keeps an
 * in-JVM dropwizard registry and pushes it via Graphite/JMX/console
 * reporters on a timer. Re-expressed engine-first: the durable commit
 * metadata IS the registry (the same rows `CALL show_metrics` serves), a
 * reporter just renders the points — so restarts, multi-writer setups and
 * backfills all report the same truth. Push cadence belongs to the
 * caller's scheduler (cron/ingest loop), not a background thread.
 */
trait MetricsReporter {
  def report(points: Seq[MetricPoint]): Unit
}

/** Console reporter (ref: ConsoleMetricsReporter.java). */
class ConsoleMetricsReporter extends MetricsReporter {
  override def report(points: Seq[MetricPoint]): Unit =
    points.foreach(p => println(s"${p.path} ${p.value} ${p.epochSeconds}"))
}

/**
 * Graphite plaintext-protocol reporter (ref: MetricsGraphiteReporter.java
 * — the reference pushes through dropwizard's GraphiteReporter; the wire
 * format is the public `<path> <value> <epoch-seconds>\n` plaintext
 * protocol, spoken here directly over one TCP connection per report).
 * Failures propagate: a monitoring pipeline that asked for push metrics
 * should see the outage, not silence.
 */
class GraphiteMetricsReporter(host: String, port: Int) extends MetricsReporter {
  override def report(points: Seq[MetricPoint]): Unit = {
    val sock = new Socket(host, port)
    try {
      val w = new OutputStreamWriter(sock.getOutputStream, "UTF-8")
      points.foreach(p => w.write(s"${p.path} ${p.value} ${p.epochSeconds}\n"))
      w.flush()
    } finally sock.close()
  }
}

object Metrics {
  /** Lenient instant → epoch-seconds. Instants are opaque ORDERED strings
    * everywhere else in the engine, and the allocator's collision path
    * (Timeline.startInstant: BigInt + 1) can mint non-calendar digit runs
    * (…115959999 + 1 → …115960000, seconds = 60) — strict
    * LocalDateTime.parse would throw for any table containing one. Decompose
    * the yyyyMMddHHmmss prefix numerically and CARRY overflowed fields
    * (sec ≥ 60 → minute, min ≥ 60 → hour, …) so every digit string maps to a
    * monotone, close-enough timestamp; anything non-numeric degrades to 0
    * rather than sinking the metrics report. */
  private[graft] def instantEpochSeconds(instant: String): Long = {
    val digits = instant.takeWhile(_.isDigit)
    if (digits.length < 14) return 0L
    def seg(from: Int, len: Int) = digits.slice(from, from + len).toInt
    try {
      var (yr, mo, dy) = (seg(0, 4), seg(4, 2), seg(6, 2))
      var (hh, mi, ss) = (seg(8, 2), seg(10, 2), seg(12, 2))
      // carry overflowed fields upward — month included: clamping mo > 12
      // to 12 would map a lexicographically LARGER digit string (…13 01…)
      // to an EARLIER epoch than …12 31…, breaking monotonicity
      mi += ss / 60; ss %= 60
      hh += mi / 60; mi %= 60
      dy += hh / 24; hh %= 24
      if (mo < 1) mo = 1
      yr += (mo - 1) / 12; mo = (mo - 1) % 12 + 1
      if (dy < 1) dy = 1
      val maxDay = java.time.YearMonth.of(yr, mo).lengthOfMonth()
      val extraDays = math.max(0, dy - maxDay)
      LocalDateTime.of(yr, mo, math.min(dy, maxDay), hh, mi, ss)
        .plusDays(extraDays.toLong).toEpochSecond(ZoneOffset.UTC)
    } catch { case _: RuntimeException => 0L }
  }

  /** The table's write metrics as points (ref: HoodieMetrics.java commit
    * duration / files / records / bytes gauges): one point per (data
    * commit, counter), pathed `<prefix>.<table>.<action>.<counter>`. */
  def points(t: GraftTable, prefix: String = "graft"): Seq[MetricPoint] = {
    t.timeline.refresh()
    val name = t.config.name
    t.timeline.metasSlim(None)
      .filter(m => Set("commit", "deltacommit", "replacecommit")(m.action) &&
        m.operation != "checkpoint") // archival bookkeeping, not a write
      .flatMap { m =>
        val ts = instantEpochSeconds(m.instant)
        def pt(counter: String, v: Long) =
          MetricPoint(s"$prefix.$name.${m.action}.$counter", v, ts)
        Seq(pt("totalFilesWritten", m.files.size.toLong),
          pt("totalRecordsWritten", m.files.map(_.rows).sum),
          pt("totalBytesWritten", m.files.map(_.bytes).sum)) ++
          m.extra.get("durationMs").map(d => pt("commitDurationMs", d.toLong))
      }
  }

  /** Render every data commit's counters through `reporter`. */
  def report(t: GraftTable, reporter: MetricsReporter,
      prefix: String = "graft"): Int = {
    val ps = points(t, prefix)
    reporter.report(ps)
    ps.size
  }
}
