package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.SchemaRegistry

/** Registry/topic introspection (reference: tools/introspector/ — list and
  * info commands over namespaces, sources, topics, schemas, plus
  * offset-watermark inspection of live topics `base_command.py:103-186`).
  */
object Introspector {

  /** Topic list with latest-schema info, newest first (the reference's
    * `list topics --sort-by updated_at --descending-order`). */
  def topicInfo(spark: SparkSession, registry: SchemaRegistry): DataFrame = {
    val topics = registry.topicsDF(spark)
    val latest = registry.schemasDF(spark)
      .groupBy(col("topic"))
      .agg(max(col("schema_id")).as("latest_schema_id"),
        count(lit(1)).as("n_schemas"),
        max(col("created_at")).as("last_schema_at"))
    topics.join(latest, topics("name") === latest("topic"), "left")
      .drop("topic")
      .orderBy(col("created_at").desc, col("topic_id").desc)
  }

  /** Per-topic offset watermarks from a transport frame — the Kafka
    * admin-API high/low watermark equivalent (reference:
    * introspector/base_command.py:103-186, _kafka_util.py:23-66). */
  def topicWatermarks(transport: DataFrame,
                      topicCol: String = "topic",
                      offsetCol: String = "offset"): DataFrame =
    transport.groupBy(col(topicCol))
      .agg(
        min(col(offsetCol)).as("low_watermark"),
        (max(col(offsetCol)) + 1).as("high_watermark"),
        count(lit(1)).as("message_count"))

  /** Published-count audit: actual published = high watermark − tracked
    * position (reference: _kafka_util.py:23-66). */
  def publishedCounts(watermarks: DataFrame, positions: DataFrame): DataFrame =
    watermarks.join(positions, "topic")
      .select(col("topic"),
        (col("high_watermark") - col("tracked_offset")).as("published_since_tracked"))

  /** Compaction-eligible topics: latest schema declares primary keys
    * (reference: tools/compaction_setter.py, schematizer.py:1221-1242). */
  def compactionEligibleTopics(registry: SchemaRegistry): Seq[String] =
    registry.topicsWithPrimaryKeys.map(_.name)
}
