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

  /** Write-door options handed to the callback before the first fire —
    * how the reference's HTTP/Kafka callbacks get their url/key config
    * (HoodieWriteCommitCallbackConfig.CALLBACK_HTTP_URL etc.). */
  def configure(options: Map[String, String]): Unit = ()
}

/**
 * HTTP commit callback (ref: hudi-client-common callback/impl/
 * HoodieWriteCommitHttpCallback.java + client/http/
 * HoodieWriteCommitHttpCallbackClient.java): POSTs the commit metadata
 * as JSON to `graft.commit.callback.http.url`, with the api key in the
 * `GRAFT-CALLBACK-KEY` header (the reference's HUDI-CALLBACK-KEY shape)
 * — over the JDK's HttpClient, no extra dependency. Unlike the
 * reference's client (which logs and swallows failures), a non-2xx or
 * connect failure PROPAGATES, per this engine's callback contract: a
 * pipeline that requested notification must not silently lose it.
 */
class HttpCommitCallback extends CommitCallback {
  private var url = ""
  private var apiKey = ""
  private var timeoutSeconds = 30L

  override def configure(options: Map[String, String]): Unit = {
    url = options.getOrElse("graft.commit.callback.http.url",
      sys.error("HttpCommitCallback needs graft.commit.callback.http.url"))
    apiKey = options.getOrElse("graft.commit.callback.http.api.key", "")
    timeoutSeconds = options.get("graft.commit.callback.http.timeout.seconds")
      .map(_.toLong).getOrElse(30L)
  }

  override def onCommit(tablePath: String, meta: CommitMeta): Unit = {
    require(url.nonEmpty, "HttpCommitCallback not configured (no url)")
    val body = Json.mapper.writeValueAsString(Map(
      "tableBasePath" -> tablePath, "instant" -> meta.instant,
      "action" -> meta.action, "operation" -> meta.operation,
      "files" -> meta.files.size, "rows" -> meta.files.map(_.rows).sum,
      "replaced" -> meta.replaced.size))
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds)).build()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
      .header("Content-Type", "application/json")
      .header("GRAFT-CALLBACK-KEY", apiKey)
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      .build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() < 300,
      s"commit callback POST $url returned ${resp.statusCode()}")
  }
}

/** Producer half of a message-bus commit callback: anything that can
  * publish one (key, payload) record to a named topic plugs in — a thin
  * Kafka/Pulsar producer wrapper in a real deployment (the brokers
  * themselves stay excluded as external systems), an in-memory fake in
  * tests. Mirrors the pull-side [[graft.streaming.OffsetRangePuller]]
  * posture. */
trait MessageBusProducer {
  def send(topic: String, key: String, payload: String): Unit
}

/**
 * Message-bus commit callback (ref: hudi-client-common callback/impl/
 * HoodieWriteCommitKafkaCallback.java + the hudi-utilities pulsar
 * sibling): publishes the commit JSON to
 * `graft.commit.callback.bus.topic`, keyed by the table name — the
 * reference keys by table so one topic can carry many tables' commit
 * streams partition-ordered per table. The producer is injected by CLASS
 * NAME (`graft.commit.callback.bus.producer.class`, a no-arg-constructible
 * [[MessageBusProducer]]), exactly how the reference injects its callback
 * implementation; failures PROPAGATE per this engine's callback contract.
 */
class MessageBusCommitCallback extends CommitCallback {
  private var topic = ""
  private var producer: MessageBusProducer = _

  override def configure(options: Map[String, String]): Unit = {
    topic = options.getOrElse("graft.commit.callback.bus.topic",
      sys.error("MessageBusCommitCallback needs graft.commit.callback.bus.topic"))
    val cls = options.getOrElse("graft.commit.callback.bus.producer.class",
      sys.error("MessageBusCommitCallback needs " +
        "graft.commit.callback.bus.producer.class"))
    producer = Class.forName(cls).getDeclaredConstructor()
      .newInstance().asInstanceOf[MessageBusProducer]
  }

  override def onCommit(tablePath: String, meta: CommitMeta): Unit = {
    require(producer != null, "MessageBusCommitCallback not configured")
    val name = java.nio.file.Paths.get(tablePath).getFileName.toString
    producer.send(topic, name, Json.mapper.writeValueAsString(Map(
      "tableBasePath" -> tablePath, "instant" -> meta.instant,
      "action" -> meta.action, "operation" -> meta.operation,
      "files" -> meta.files.size, "rows" -> meta.files.map(_.rows).sum,
      "replaced" -> meta.replaced.size)))
  }
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
  /** Instantiate + fire the configured callback for `instant`, if any.
    * `options` (the write-door parameter map) configures callbacks that
    * need endpoints/keys, e.g. [[HttpCommitCallback]]. */
  def fire(className: Option[String], t: GraftTable, instant: String,
      options: Map[String, String] = Map.empty): Unit =
    className.filter(_.nonEmpty).foreach { cls =>
      val cb = Class.forName(cls).getDeclaredConstructor()
        .newInstance().asInstanceOf[CommitCallback]
      cb.configure(options)
      t.timeline.refresh()
      val action = t.timeline.completed().find(_._1 == instant).map(_._2)
        .getOrElse(throw new IllegalStateException(
          s"commit callback: instant $instant not found on the timeline"))
      cb.onCommit(t.basePath, t.timeline.read(instant, action))
    }
}
