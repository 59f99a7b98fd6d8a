package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Client monitoring aggregation (reference: client.py:170-347 `_Monitor`):
  * one message-count record per (topic, client, fixed window aligned to
  * the epoch), default 600 s.
  *
  * In the reference this is hand-rolled per-process state with catch-up
  * flushes of empty windows; here it is a watermarked streaming
  * aggregation — state eviction and late-data handling come from the
  * engine, and the same call works on a batch frame (degenerates to a
  * groupBy). Partial aggregation keeps the shuffle at one row per
  * (topic, window) per task.
  */
object MonitorStream {

  val DefaultWindowSeconds: Int = 600

  /** @param messages  frame with an event-time `ts` timestamp column and a
    *                  `topic` column
    * @param clientName logical client id recorded on each monitor row
    * @param windowSec  fixed window width (epoch-aligned)
    * @param watermark  how long to admit late data in streaming mode
    */
  def monitorCounts(
      messages: DataFrame,
      clientName: String,
      clientType: String,
      windowSec: Int = DefaultWindowSeconds,
      watermark: String = "10 minutes"): DataFrame = {
    val withTime =
      if (messages.isStreaming) messages.withWatermark("ts", watermark) else messages
    withTime
      .groupBy(window(col("ts"), s"$windowSec seconds").as("w"), col("topic"))
      .agg(count(lit(1)).cast("int").as("message_count"))
      .select(
        col("topic"),
        lit(clientName).as("client_name"),
        lit(clientType).as("client_type"),
        col("message_count"),
        unix_timestamp(col("w.start")).cast("int").as("start_timestamp"))
  }

  /** Batch variant with the reference's catch-up flush (client.py:316-324):
    * quiet windows between a topic's first and last activity emit explicit
    * zero-count rows, so auditors can distinguish "stalled" from "empty".
    *
    * Single-pass shape: one (topic, window) count aggregation, then one
    * per-topic aggregation that sorts the observed windows and expands
    * the quiet gaps between consecutive entries inline. The source is
    * scanned ONCE with nothing pinned — the earlier range-generate +
    * left-join formulation either localCheckpointed the counts (cached
    * blocks that outlive the call and a non-recomputable lineage that
    * fails on executor loss) or scanned the source twice (column pruning
    * makes the two aggregate branches non-identical, so exchange reuse
    * cannot deduplicate them — verified on the physical plan). Per-topic
    * state is the OBSERVED-window list only; gap zeros are generated at
    * emit, never stored. */
  def monitorCountsWithCatchup(
      messages: DataFrame,
      clientName: String,
      clientType: String,
      windowSec: Int = DefaultWindowSeconds,
      maxWindowsPerTopic: Int = 1 << 19): DataFrame = {
    val step = windowSec.toLong
    val aligned = (floor(unix_timestamp(col("ts")) / windowSec) * windowSec).cast("long")
    messages
      // a null ts has no window: drop it BEFORE aggregating (the
      // range-join formulation dropped the null bucket implicitly). If
      // it survived, its null start_timestamp would null the next
      // entry's gap arithmetic, sequence(null, ..) would null that
      // transform element, and flatten() of an array containing a null
      // array returns NULL — explode would then emit ZERO rows for the
      // topic, erasing every observed window because of one bad row.
      .filter(col("ts").isNotNull)
      .groupBy(col("topic"), aligned.as("start_timestamp"))
      .agg(count(lit(1)).cast("int").as("observed"))
      .groupBy(col("topic"))
      .agg(sort_array(collect_list(struct(col("start_timestamp"), col("observed"))))
        .as("obs"))
      // the blow-up hazard is the EMITTED span — observed windows PLUS
      // the gap-fill's generated zeros ((last−first)/windowSec + 1 per
      // topic): a topic with just TWO messages six years apart at a 30 s
      // window would materialize ~6.3M zero structs in one flatten()
      // value before the explode ever runs. Cap that span (default 2^19
      // emitted windows ≈ 8 MiB/row ≈ 6 months of 30 s windows) and FAIL
      // LOUDLY naming the topic: narrow the time range, widen windowSec,
      // or use the streaming variant (whose state is watermark-bounded).
      // `obs` is sorted ascending, so first/last elements bound the span
      // without touching the interior. The guard row-filters on the
      // assert's null result so column pruning can never drop it.
      .withColumn("__cap", assert_true(
        expr(s"(element_at(obs, -1).start_timestamp - " +
          s"element_at(obs, 1).start_timestamp) div ${step}L " +
          s"< ${maxWindowsPerTopic.toLong}L"),
        concat(lit("monitorCountsWithCatchup: topic "), col("topic"),
          lit(s" would emit more than $maxWindowsPerTopic windows — narrow" +
            " the time range, widen windowSec, or use the streaming variant"))))
      .filter(col("__cap").isNull)
      .drop("__cap")
      // (e, i) -> the entry itself, prefixed by one zero struct per quiet
      // window since the previous entry. Lazy IF keeps the obs[i-1]
      // access (ANSI: out-of-bounds throws) behind the i = 0 guard, and
      // the gap guard keeps sequence() bounds valid.
      .select(col("topic"), explode(expr(
        s"""flatten(transform(obs, (e, i) ->
              IF(i = 0, array(e),
                 IF(e.start_timestamp - obs[i-1].start_timestamp <= ${step}L,
                    array(e),
                    concat(transform(
                             sequence(obs[i-1].start_timestamp + ${step}L,
                                      e.start_timestamp - ${step}L, ${step}L),
                             w -> struct(w AS start_timestamp,
                                         CAST(0 AS INT) AS observed)),
                           array(e))))))""")).as("w"))
      .select(
        col("topic"),
        lit(clientName).as("client_name"),
        lit(clientType).as("client_type"),
        col("w.observed").as("message_count"),
        // int like monitorCounts — the monitoring_message_v1 contract
        // (start_timestamp: int); the aggregations must stay
        // schema-interchangeable
        col("w.start_timestamp").cast("int").as("start_timestamp"))
  }

  // --- streaming catch-up (client.py:303-324, incremental form) ----------

  case class MonEvent(topic: String, ts: java.sql.Timestamp)
  case class MonState(lastClosed: Long, open: Map[Long, Int])
  case class MonitorRow(topic: String, message_count: Int, start_timestamp: Long)

  /** Streaming monitor with the reference's catch-up flush: per topic,
    * a window emits once the watermark passes its end, and quiet windows
    * BETWEEN emissions flush as explicit zero rows (stalled vs empty
    * stays distinguishable without heartbeat unions).
    *
    * State per topic is one long + the open-window count map, bounded by
    * the watermark horizon (closed windows leave the map immediately);
    * idle topics keep only `lastClosed` and schedule no timers, so an
    * idle topic costs 16 bytes of state and zero wakeups — matching the
    * reference, which flushes only up to the latest observed message. */
  def monitorCountsWithCatchupStreaming(
      events: Dataset[MonEvent],
      clientName: String,
      clientType: String,
      windowSec: Int = DefaultWindowSeconds,
      delay: String = "10 minutes"): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delay)
      .groupByKey(_.topic)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        catchupUpdate(windowSec))
      .select(col("topic"), lit(clientName).as("client_name"),
        lit(clientType).as("client_type"), col("message_count"),
        // int like monitorCounts / the batch catch-up: the
        // monitoring_message_v1 contract pins start_timestamp to int, and
        // the three aggregations must stay schema-interchangeable
        col("start_timestamp").cast("int").as("start_timestamp"))
  }

  private def catchupUpdate(windowSec: Int)(
      topic: String,
      rows: Iterator[MonEvent],
      state: GroupState[MonState]): Iterator[MonitorRow] = {
    val step = windowSec.toLong
    // window starts strictly below this are closed by the watermark
    val closedBelow =
      math.floorDiv(state.getCurrentWatermarkMs() / 1000, step) * step
    var st = state.getOption.getOrElse(MonState(Long.MinValue, Map.empty))
    rows.foreach { e =>
      val w = math.floorDiv(e.ts.getTime / 1000, step) * step
      st = st.copy(open = st.open + (w -> (st.open.getOrElse(w, 0) + 1)))
    }
    val toClose = st.open.keys.filter(_ < closedBelow).toSeq.sorted
    val out = Seq.newBuilder[MonitorRow]
    var last = st.lastClosed
    toClose.foreach { w =>
      if (last != Long.MinValue) {
        var gap = last + step
        while (gap < w) { out += MonitorRow(topic, 0, gap); gap += step }
      }
      out += MonitorRow(topic, st.open(w), w)
      last = w
    }
    st = MonState(last, st.open -- toClose)
    state.update(st)
    // wake when the watermark can close the earliest still-open window;
    // idle topics (nothing open) set no timer and cost nothing
    st.open.keys.minOption.foreach { w =>
      state.setTimeoutTimestamp((w + step) * 1000 + 1)
    }
    out.result().iterator
  }
}
