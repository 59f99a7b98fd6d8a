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
    // Spark's specific-offsets JSON must name every TopicPartition of
    // the subscription — partition counts are broker metadata we cannot
    // see here, but a topic-level mismatch IS checkable: failing loudly
    // with the topic list beats the source's opaque all-TopicPartitions
    // assertion at stream start (a new topic since the last checkpoint
    // is the common way offsets go stale — resume it with a fresh
    // earliest read by omitting it from startingOffsets entirely)
    if (startingOffsets.nonEmpty) {
      val missing = topics.toSet -- startingOffsets.keySet.map(_._1)
      val extra = startingOffsets.keySet.map(_._1) -- topics.toSet
      require(missing.isEmpty && extra.isEmpty,
        s"startingOffsets must cover exactly the subscribed topics; " +
          s"missing=${missing.mkString(",")} extra=${extra.mkString(",")}")
    }
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
    * to the broker-side timestamp index via the GLOBAL
    * `startingTimestamp` option: the per-partition
    * startingOffsetsByTimestamp JSON has NO partition wildcard — Spark
    * parses a "-1" key as TopicPartition(t, -1), which matches nothing
    * and fails the all-TopicPartitions assertion at start. One global
    * timestamp covers every subscribed partition without needing broker
    * metadata here. `failOnDataLoss` defaults TRUE: a timestamp seek is
    * an exact-position inspection (the Tailer contract) — silently
    * resetting to earliest when retention expired the target offsets
    * would return data from a different position with no error. */
  def sourceOptionsByTimestamp(bootstrapServers: String, topics: Seq[String],
                               startMillis: Long,
                               failOnDataLoss: Boolean = true): Map[String, String] = {
    require(topics.nonEmpty, "subscription needs at least one topic")
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topics.sorted.mkString(","),
      "startingTimestamp" -> startMillis.toString,
      "failOnDataLoss" -> failOnDataLoss.toString)
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
             maxOffsetsPerTrigger: Option[Long] = None): DataStreamReader =
    readerForTopics(spark, registry, source.resolve(registry),
      bootstrapServers, startingOffsets, maxOffsetsPerTrigger)

  /** [[reader]] over an EXPLICIT topic set — what a restart under a
    * [[TopicRefreshController]] must use: incremental sources
    * (NewTopicsOnly) resolve only post-cutoff topics after a commit, so
    * re-resolving on restart would silently drop the accumulated
    * subscription (or throw on an empty delta); the controller's
    * `currentTopics` is the authoritative set. Refuses a topic set
    * spanning kafka cluster types — one subscription rides ONE broker
    * list, and the wrong-cluster topics would otherwise just be absent
    * there (the loud [[graft.core.NamespaceInfo]] cluster contract the
    * control plane enforces on every tick). */
  def readerForTopics(spark: SparkSession, registry: SchemaRegistry,
                      topics: Set[String], bootstrapServers: String,
                      startingOffsets: Map[(String, Int), Long] = Map.empty,
                      maxOffsetsPerTrigger: Option[Long] = None): DataStreamReader = {
    ConsumerSource.determineClusterType(registry, topics)
    sourceOptions(bootstrapServers, topics.toSeq, startingOffsets,
        maxOffsetsPerTrigger)
      .foldLeft(spark.readStream.format("kafka"))((r, kv) => r.option(kv._1, kv._2))
  }
}
