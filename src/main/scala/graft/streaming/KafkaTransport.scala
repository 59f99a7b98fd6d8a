package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamReader, DataStreamWriter, Trigger}

import graft.schema.SchemaRegistry

/** The Kafka edge: wiring between [[Pipeline]]'s transport rows and
  * Spark's Kafka source/sink (reference: _kafka_producer.py:60-260 producer
  * config + buffering; consumer.py:162-247 group consumption;
  * base_consumer.py:690-759 offset state maps;
  * tools/timestamp_to_offset_mapper.py timestamp seeks).
  *
  * Option construction is PURE (maps of the documented spark-sql-kafka
  * option keys) so the wiring is unit-testable in this sandbox, which
  * ships no Kafka artifacts — `format("kafka")` here resolves only at
  * `start()`/`load()` on a cluster with spark-sql-kafka-0-10 deployed.
  * [[writer]]/[[reader]] construct fully-configured (not started) plans
  * from those maps; nothing else in the engine knows Kafka option strings.
  *
  * Reference producer semantics → Kafka producer configs:
  *  - acks=-1 (config.py:322-329)            → `kafka.acks=all`
  *  - 100 ms flush trigger (config.py:360-367)→ `kafka.linger.ms=100` +
  *    a 100 ms processing-time trigger
  *  - 5000-message buffers (config.py:350-358)→ `kafka.batch.size`
  *  - exactly-once retry audit (ST2)          → `kafka.enable.idempotence`
  */
object KafkaTransport {

  val DefaultLingerMs = 100L    // reference flush interval
  val DefaultBatchMessages = 5000 // reference buffer size

  /** Producer/sink options (spark-sql-kafka passes `kafka.`-prefixed keys
    * through to the Kafka producer). The sink routes each row by its
    * `topic` column, so no `topic` option is set. */
  def sinkOptions(bootstrapServers: String, checkpointDir: String,
                  avgMessageBytes: Int = 512): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "checkpointLocation" -> checkpointDir,
    "kafka.acks" -> "all",
    "kafka.enable.idempotence" -> "true",
    "kafka.linger.ms" -> DefaultLingerMs.toString,
    "kafka.batch.size" -> (DefaultBatchMessages * avgMessageBytes).toString,
    "kafka.compression.type" -> "lz4")

  /** Subscription options for a resolved topic set, with optional resume
    * offsets (the reference's topic_to_consumer_topic_state_map,
    * base_consumer.py:690-744) and a per-trigger throughput cap (ST9). */
  def sourceOptions(bootstrapServers: String, topics: Seq[String],
                    startingOffsets: Map[(String, Int), Long] = Map.empty,
                    maxOffsetsPerTrigger: Option[Long] = None,
                    failOnDataLoss: Boolean = false): Map[String, String] = {
    require(topics.nonEmpty, "subscription needs at least one topic")
    val base = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topics.sorted.mkString(","),
      "startingOffsets" ->
        (if (startingOffsets.isEmpty) "earliest"
         else offsetsJson(startingOffsets)),
      "failOnDataLoss" -> failOnDataLoss.toString)
    base ++ maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)
  }

  /** Timestamp-seek options (reference:
    * tools/timestamp_to_offset_mapper.py:31-263 binary search — delegated
    * to the broker-side index via startingOffsetsByTimestamp). */
  def sourceOptionsByTimestamp(bootstrapServers: String, topics: Seq[String],
                               startMillis: Long): Map[String, String] = {
    require(topics.nonEmpty, "subscription needs at least one topic")
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topics.sorted.mkString(","),
      "startingOffsetsByTimestamp" ->
        topics.sorted.map(t => s""""$t": {"-1": $startMillis}""")
          .mkString("{", ", ", "}"),
      "failOnDataLoss" -> "false")
  }

  /** `{"topic": {"partition": offset}}` JSON for startingOffsets. */
  def offsetsJson(offsets: Map[(String, Int), Long]): String =
    offsets.groupBy(_._1._1).toSeq.sortBy(_._1).map { case (topic, parts) =>
      val inner = parts.toSeq.map { case ((_, p), o) => s""""$p": $o""" }
        .sortBy(_.trim).mkString("{", ", ", "}")
      s""""$topic": $inner"""
    }.mkString("{", ", ", "}")

  /** Fully-configured (not started) Kafka sink for Pipeline.produce rows —
    * (topic, key, value) columns are exactly the sink's contract. */
  def writer(transport: DataFrame, bootstrapServers: String,
             checkpointDir: String): DataStreamWriter[Row] = {
    val cols = transport.columns.toSet
    require(Set("topic", "value").subsetOf(cols),
      s"transport rows need topic/value columns, got $cols")
    sinkOptions(bootstrapServers, checkpointDir)
      .foldLeft(transport.writeStream.format("kafka"))((w, kv) => w.option(kv._1, kv._2))
      .trigger(Trigger.ProcessingTime(DefaultLingerMs))
  }

  /** Fully-configured (not loaded) Kafka source for a consumer-source
    * resolution; `.load()` yields (key, value, topic, partition, offset,
    * timestamp, …) — feed `.selectExpr("topic", "key", "value")` into
    * [[Pipeline.consume]]. */
  def reader(spark: SparkSession, registry: SchemaRegistry,
             source: ConsumerSource, bootstrapServers: String,
             startingOffsets: Map[(String, Int), Long] = Map.empty,
             maxOffsetsPerTrigger: Option[Long] = None): DataStreamReader = {
    val topics = source.resolve(registry).toSeq
    sourceOptions(bootstrapServers, topics, startingOffsets, maxOffsetsPerTrigger)
      .foldLeft(spark.readStream.format("kafka"))((r, kv) => r.option(kv._1, kv._2))
  }
}
