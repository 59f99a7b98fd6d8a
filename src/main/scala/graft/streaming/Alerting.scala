package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Ops-alerting side channel (reference:
  * data_pipeline/tools/heartbeat_periodic_processor.py:25-60,
  * sensu_alert_manager.py:28-127, sensu_ttl_alerter.py:24-55,
  * meteorite_gauge_manager.py:23-59).
  *
  * The reference drives these off every produced message inside the
  * client; in Spark the equivalent beat is the engine's own
  * [[StreamingQueryListener]] progress events, so the alerting is a
  * listener-driven side channel — no per-row cost, no operator in the
  * data plan. The network transports (pysensu, meteorite) are injected
  * `send`/`set` functions: in production they post to the monitoring
  * system, in tests they append to a buffer. Clocks are injected too, so
  * the interval/TTL semantics are spec-testable without wall time.
  */
object Alerting {

  /** One monitoring event (the subset of the reference's result_dict the
    * semantics depend on): status 0 = OK, 2 = CRITICAL; `ttlSeconds`
    * None means "final event, stop watching for TTLs" — exactly how the
    * reference signals disable to the deadman watcher. */
  final case class AlertEvent(
      service: String,
      status: Int,
      output: String,
      ttlSeconds: Option[Long],
      checkEverySeconds: Long)

  /** Interval gate (reference BasePeriodicProcessor): `maybeProcess`
    * forwards to `process` only when the injected clock has reached the
    * next deadline, then re-arms from a clock read taken AFTER `process`
    * returns (reference parity: a slow `process` must not shorten the
    * effective interval to the next run). Subclasses implement
    * `process`. */
  abstract class PeriodicProcessor(val intervalSeconds: Long,
                                   nowMillis: () => Long) {
    private val nextAt = new AtomicLong(nowMillis())
    final def maybeProcess(eventTimeMillis: Option[Long]): Unit = {
      val now = nowMillis()
      if (now >= nextAt.get()) {
        process(eventTimeMillis, now)
        nextAt.set(nowMillis() + intervalSeconds * 1000L)
      }
    }
    protected def process(eventTimeMillis: Option[Long], nowMillis: Long): Unit
  }

  /** Falling-behind alert (reference SensuAlertManager): delay = now −
    * event time. Within `maxDelaySeconds` → OK ("caught up"); beyond it →
    * CRITICAL with the delay in the output. A None timestamp or a
    * disabled manager emits nothing; toggling disable false→true emits
    * ONE final TTL-free event so the deadman watcher stands down instead
    * of alerting forever. */
  final class DelayAlertManager(
      intervalSeconds: Long,
      serviceName: String,
      maxDelaySeconds: Long,
      ttlSeconds: Long,
      send: AlertEvent => Unit,
      nowMillis: () => Long,
      initiallyDisabled: Boolean = false)
    extends PeriodicProcessor(intervalSeconds, nowMillis) {

    @volatile private var disabled = initiallyDisabled
    def isDisabled: Boolean = disabled
    def setDisabled(value: Boolean): Unit = {
      if (!disabled && value)
        send(AlertEvent(serviceName, 0,
          s"disabling alert for $serviceName", None, intervalSeconds))
      disabled = value
    }

    protected def process(eventTimeMillis: Option[Long], now: Long): Unit =
      if (!disabled) eventTimeMillis.foreach { ts =>
        val delayMs = now - ts
        if (delayMs <= maxDelaySeconds * 1000L)
          send(AlertEvent(serviceName, 0,
            s"$serviceName has caught up to real time",
            Some(ttlSeconds), intervalSeconds))
        else
          send(AlertEvent(serviceName, 2,
            s"$serviceName is falling ${delayMs / 1000.0} s behind real time",
            Some(ttlSeconds), intervalSeconds))
      }
  }

  /** Deadman switch (reference SensuTTLAlerter): while enabled, every
    * beat re-sends the TTL'd event — if the process dies, the event stops
    * arriving and the monitoring system alerts when the TTL lapses.
    * Toggling enable true→false sends one final TTL-free event (a planned
    * shutdown must not page). A [[PeriodicProcessor]], so it plugs
    * straight into [[ProgressAlertListener]] and is beat by the stream's
    * own progress (the reference beats it from the producer loop);
    * `process()` stays callable for manual beats. */
  final class TtlAlerter(event: AlertEvent, send: AlertEvent => Unit,
                         intervalSeconds: Long,
                         nowMillis: () => Long = () => System.currentTimeMillis(),
                         initiallyEnabled: Boolean = true)
    extends PeriodicProcessor(intervalSeconds, nowMillis) {
    require(event.ttlSeconds.nonEmpty, "a TTL alerter needs a ttl")
    @volatile private var enabled = initiallyEnabled
    def isEnabled: Boolean = enabled
    def process(): Unit = if (enabled) send(event)
    protected def process(eventTimeMillis: Option[Long], now: Long): Unit =
      process()
    def setEnabled(value: Boolean): Unit = {
      if (enabled && !value) send(event.copy(ttlSeconds = None))
      enabled = value
    }
  }

  /** Delay gauge (reference MeteoriteGaugeManager): periodically sets an
    * injected gauge to the current delay in seconds; disabled → no-op. */
  final class DelayGaugeManager(
      intervalSeconds: Long,
      set: Double => Unit,
      nowMillis: () => Long,
      var disable: Boolean = false)
    extends PeriodicProcessor(intervalSeconds, nowMillis) {
    protected def process(eventTimeMillis: Option[Long], now: Long): Unit =
      if (!disable) eventTimeMillis.foreach(ts => set((now - ts) / 1000.0))
  }

  /** The Spark seam: a [[StreamingQueryListener]] that feeds query
    * progress beats to the registered processors, carrying the batch's
    * max event time (the same "timestamp of the message being processed"
    * the reference passes to `periodic_process`). Attach with
    * `spark.streams.addListener(...)`.
    *
    * `forQuery` scopes the listener to ONE query (by name or run id):
    * processors hold per-stream state (delay deadlines, deadman TTLs),
    * so feeding them beats from EVERY query on a multi-query session
    * let a healthy query's beat consume the interval deadline and
    * refresh the TTL while another query sat hours behind — a dead
    * pipeline that pages nobody. Leave None only on single-query
    * sessions; attach one listener per monitored query otherwise.
    *
    * Each processor is isolated: one processor's throwing `send` (a
    * down monitoring endpoint) must not starve the processors after it
    * in the list — most critically the deadman beat. */
  final class ProgressAlertListener(
      processors: Seq[PeriodicProcessor],
      forQuery: Option[String] = None) extends StreamingQueryListener {

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit =
      if (forQuery.forall(q =>
          q == e.progress.name || q == e.progress.id.toString))
        beat(maxEventTimeMillis(e.progress.eventTime))

    /** Count of processor beats that threw — a permanently broken alert
      * sink (a misconfigured deadman, a down endpoint) must be VISIBLE,
      * not silently absorbed forever; ops can scrape this alongside the
      * alerts themselves. */
    val beatFailures = new AtomicLong(0L)

    /** One beat through every processor, each isolated from the others'
      * failures (also the test seam — QueryProgressEvent cannot be
      * constructed outside Spark). A failure logs and counts — never
      * silently, never starving the processors after it. */
    private[graft] def beat(ts: Option[Long]): Unit =
      processors.foreach { p =>
        try p.maybeProcess(ts)
        catch {
          case scala.util.control.NonFatal(e) =>
            beatFailures.incrementAndGet()
            System.err.println(
              s"[alerting] processor ${p.getClass.getSimpleName} beat failed: $e")
        }
      }

    /** Parse the progress map's "max" event time (ISO-8601 UTC). */
    private[graft] def maxEventTimeMillis(
        eventTime: java.util.Map[String, String]): Option[Long] =
      Option(eventTime.get("max")).flatMap { iso =>
        try Some(java.time.Instant.parse(
          if (iso.endsWith("Z")) iso else iso.replace(' ', 'T') + "Z").toEpochMilli)
        catch { case _: java.time.format.DateTimeParseException => None }
      }
  }
}
