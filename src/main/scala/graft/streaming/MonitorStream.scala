package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    * The window range generates per topic (sequence + explode) and
    * left-joins the observed counts — no per-window state. */
  def monitorCountsWithCatchup(
      messages: DataFrame,
      clientName: String,
      clientType: String,
      windowSec: Int = DefaultWindowSeconds): DataFrame = {
    val aligned = (floor(unix_timestamp(col("ts")) / windowSec) * windowSec).cast("long")
    val counts = messages
      .groupBy(col("topic"), aligned.as("start_timestamp"))
      .agg(count(lit(1)).cast("int").as("observed"))
    val ranges = counts.groupBy(col("topic"))
      .agg(min(col("start_timestamp")).as("w0"), max(col("start_timestamp")).as("w1"))
      .select(col("topic"),
        explode(sequence(col("w0"), col("w1"), lit(windowSec.toLong))).as("start_timestamp"))
    ranges.join(counts, Seq("topic", "start_timestamp"), "left")
      .select(
        col("topic"),
        lit(clientName).as("client_name"),
        lit(clientType).as("client_type"),
        coalesce(col("observed"), lit(0)).as("message_count"),
        col("start_timestamp"))
  }
}
