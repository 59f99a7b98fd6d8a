package graft.tools

import scala.util.matching.Regex

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Topic tailing surface (reference: tools/tailer.py): consume a topic
  * from optional offsets/timestamps, project requested message fields,
  * format timestamps ISO-8601, JSON-encode, bounded by a message limit.
  *
  * Works over any consumed frame (batch or streaming) that carries the
  * envelope metadata columns; on a cluster the offset/timestamp bounds
  * map to the Kafka source's `startingOffsets` /
  * `startingOffsetsByTimestamp` options instead of post-filters.
  */
object Tailer {

  /** `topic_name|offset` spec (reference: tailer.py:317-327). */
  final case class TopicSpec(topic: String, offset: Option[Long])

  private val specRe: Regex = """^([^|]+)(?:\|(\d+))?$""".r

  def parseTopicSpec(spec: String): TopicSpec = spec match {
    case specRe(t, null) => TopicSpec(t, None)
    case specRe(t, off) => TopicSpec(t, Some(off.toLong))
    case _ => throw new IllegalArgumentException(s"bad topic spec: $spec")
  }

  /** Offset-range validation against topic watermarks (reference:
    * tailer.py:278-308): requested offset must lie in [low, high]. */
  def validateOffset(requested: Long, lowWatermark: Long, highWatermark: Long): Unit =
    require(requested >= lowWatermark && requested <= highWatermark,
      s"offset $requested outside [$lowWatermark, $highWatermark]")

  final val DefaultFields: Seq[String] = Seq("message_type", "schema_id", "payload")

  /** Kafka source options for the given topic specs: offset seeks map to
    * startingOffsets (partition 0 — the reference producer always writes
    * partition 0, _kafka_producer.py:243-247), a start timestamp to the
    * broker-side startingOffsetsByTimestamp index.
    *
    * Contract guards: (1) Spark rejects a specific-offsets JSON that does
    * not cover every subscribed topic, so offset-LESS topics get the -2
    * (earliest) sentinel alongside the explicit seeks; (2) a timestamp
    * seek and explicit per-topic offsets are mutually exclusive in the
    * Kafka source — supplying both is refused loudly instead of silently
    * discarding the user's offsets; (3) a tailing tool exists to inspect
    * EXACT positions, so failOnDataLoss=true — an out-of-range seek must
    * error, never silently reset to a different position. */
  def kafkaOptions(bootstrapServers: String, specs: Seq[TopicSpec],
                   startTimestampSec: Option[Long] = None): Map[String, String] =
    startTimestampSec match {
      case Some(ts) =>
        require(specs.forall(_.offset.isEmpty),
          "explicit per-topic offsets cannot combine with a timestamp " +
            s"seek (offsets given for ${specs.filter(_.offset.nonEmpty).map(_.topic).mkString(",")})")
        graft.streaming.KafkaTransport.sourceOptionsByTimestamp(
          bootstrapServers, specs.map(_.topic), ts * 1000L)
      case None if specs.exists(_.offset.nonEmpty) =>
        graft.streaming.KafkaTransport.sourceOptions(
          bootstrapServers, specs.map(_.topic),
          specs.map(s => (s.topic, 0) -> s.offset.getOrElse(-2L)).toMap,
          failOnDataLoss = true)
      case None =>
        graft.streaming.KafkaTransport.sourceOptions(
          bootstrapServers, specs.map(_.topic), failOnDataLoss = true)
    }

  /** Tail projection: select fields, optional ISO-8601 time, optional
    * timestamp bounds and message limit, JSON lines output column. */
  def tail(
      consumed: DataFrame,
      fields: Seq[String] = DefaultFields,
      isoTime: Boolean = false,
      startTimestamp: Option[Long] = None,
      endTimestamp: Option[Long] = None,
      messageLimit: Option[Int] = None,
      json: Boolean = false): DataFrame = {
    var df = consumed
    startTimestamp.foreach(t => df = df.filter(col("timestamp") >= t))
    endTimestamp.foreach(t => df = df.filter(col("timestamp") < t))
    // deterministic first-N: the reference tailer consumes sequentially
    // and stops after N in offset order — a bare limit() on a
    // multi-partition frame keeps whichever rows arrive first, so
    // repeated runs of the same tail print different messages. Order by
    // the best available sequencing columns (plans as
    // TakeOrderedAndProject — a per-partition top-N, not a global
    // sort) before cutting; the sort runs pre-projection because the
    // projection may reformat or drop the ordering columns.
    messageLimit.foreach { n =>
      val seqCols = Seq("offset", "timestamp", "uuid")
        .filter(df.columns.contains).map(col)
      df = (if (seqCols.nonEmpty) df.orderBy(seqCols: _*) else df).limit(n)
    }
    val projected: Seq[Column] = fields.map {
      case "timestamp" if isoTime =>
        // rendered in UTC by construction (convert_timezone → NTZ wall
        // time), not the session timezone — the same envelope must tail
        // identically on every cluster config
        date_format(convert_timezone(lit("UTC"), to_timestamp(col("timestamp"))),
          "yyyy-MM-dd'T'HH:mm:ss").as("timestamp")
      case "uuid" => hex(col("uuid")).as("uuid")
      case f => col(f)
    }
    df = df.select(projected: _*)
    if (json) df.select(to_json(struct(col("*"))).as("line")) else df
  }
}
