package graft.streaming

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Throughput counters/timers over query plans (SURVEY §2.3 A6 — the
  * meteorite StatCounter/StatTimer analog, reference:
  * tools/meteorite_wrappers.py:25-115).
  *
  * The reference flushes a counter thread every 0.25 s; the Spark-native
  * equivalent attaches `observe()` metrics to the plan — computed inside
  * the running job at zero extra passes — and reads them per micro-batch
  * through a [[StreamingQueryListener]]. Emission cadence is the trigger
  * interval, the natural flush unit of this engine.
  *
  * Batch queries: use `org.apache.spark.sql.Observation` directly — it
  * blocks until the action finishes and returns the same metric row.
  */
object Metrics {

  /** Tag a frame with a named observation point: row throughput plus an
    * optional summed column (e.g. payload bytes for byte throughput). */
  def observeThroughput(df: DataFrame, point: String,
                        bytesCol: Option[Column] = None): DataFrame = {
    val aggs = count(lit(1)).as("message_count") +:
      bytesCol.map(c => sum(c).as("byte_count")).toSeq
    df.observe(point, aggs.head, aggs.tail: _*)
  }

  /** Accumulates observed metrics per observation point across micro-
    * batches — the counter registry clients poll (or a metrics exporter
    * drains). Thread-safe; one instance can watch many queries. */
  final class CounterListener extends StreamingQueryListener {
    private val counts = TrieMap.empty[String, Long]
    private val bytes = TrieMap.empty[String, Long]

    def messageCount(point: String): Long = counts.getOrElse(point, 0L)
    def byteCount(point: String): Long = bytes.getOrElse(point, 0L)
    def points: Set[String] = counts.keySet.toSet

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      e.progress.observedMetrics.asScala.foreach { case (point, row) =>
        if (row.schema.fieldNames.contains("message_count") && !row.isNullAt(
            row.fieldIndex("message_count"))) {
          val c = row.getAs[Long]("message_count")
          counts.updateWith(point) { prev => Some(prev.getOrElse(0L) + c) }
        }
        if (row.schema.fieldNames.contains("byte_count") && !row.isNullAt(
            row.fieldIndex("byte_count"))) {
          val b = row.getAs[Long]("byte_count")
          bytes.updateWith(point) { prev => Some(prev.getOrElse(0L) + b) }
        }
      }
    }
  }
}
