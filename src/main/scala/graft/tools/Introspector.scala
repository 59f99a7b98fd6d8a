package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.SchemaRegistry

/** Registry/topic introspection (reference: tools/introspector/ — list and
  * info commands over namespaces, sources, topics, schemas, plus
  * offset-watermark inspection of live topics `base_command.py:103-186`).
  *
  * The DataFrame helpers on this object are the distributed pieces
  * (watermarks from a transport frame); the [[Introspector.Commands]]
  * class is the command suite itself — all control-plane reads over the
  * bounded in-process catalog, mirroring the reference's subcommand
  * surface: `info namespace|source|topic`, `list namespaces|sources|
  * topics` with sort/filter parity, `register avro|mysql` delegating to
  * the registry converters, and `schema-check`.
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
    // ONE eligibility rule: delegate to the compaction setter's own
    // computation so the introspector's report can never drift from
    // what the setter actually compacts (e.g. a future disabled-topic
    // filter added to one but not the other)
    CompactionSetter.topicsToCompact(registry)

  // --- command-suite row models (reference: introspector/models/*.py —
  //     field lists ARE the reference's _fields orderings) ---------------

  /** `models/namespace.py:14-39`. Active counts present only when the
    * expensive active scan was requested (reference passes
    * `active_namespaces` conditionally). */
  final case class NamespaceRow(
      name: String,
      namespaceId: Int,
      activeSourceCount: Option[Int],
      activeTopicCount: Option[Int])

  /** `models/source.py:14-37`. */
  final case class SourceRow(
      name: String,
      sourceId: Int,
      ownerEmail: String,
      namespace: String,
      activeTopicCount: Option[Int])

  /** `models/topic.py:14-50`. `inKafka`/`messageCount` present only when
    * the command was built with transport info; `updatedAt == createdAt`
    * because registry topics are immutable (schema changes spawn new
    * topics or new schema rows, never mutate a topic). */
  final case class TopicRow(
      name: String,
      topicId: Int,
      containsPii: Boolean,
      primaryKeys: Seq[String],
      inKafka: Option[Boolean],
      messageCount: Option[Long],
      sourceName: String,
      sourceId: Int,
      namespace: String,
      clusterType: String,
      createdAt: Long,
      updatedAt: Long)

  /** `models/schema.py:14-34`. `status` is "RW" for schemas on their
    * source's latest topic (writable), "R" otherwise (reference:
    * AvroSchema.status — disabled topics are not modeled here). */
  final case class SchemaRow(
      schemaId: Int,
      baseSchemaId: Option[Int],
      status: String,
      primaryKeys: Seq[String],
      createdAt: Long,
      note: Option[String],
      schemaJson: String,
      topic: Option[TopicRow])

  final case class NamespaceInfo(namespace: NamespaceRow, sources: Seq[SourceRow])
  final case class SourceInfo(source: SourceRow, topics: Seq[TopicRow])
  final case class TopicInfo(topic: TopicRow, schemas: Seq[SchemaRow])

  /** Sortable fields per list type (reference: list_command/{topics,
    * sources,namespaces}.py `fields`) — an unknown `--sort-by` is the
    * parser error the reference raises. */
  val TopicFields: Seq[String] = Seq("name", "topic_id", "contains_pii",
    "primary_keys", "in_kafka", "message_count", "source_name", "source_id",
    "namespace", "created_at", "updated_at")
  val SourceFields: Seq[String] = Seq("name", "source_id", "owner_email",
    "namespace", "active_topic_count")
  val NamespaceFields: Seq[String] = Seq("name", "namespace_id",
    "active_topic_count", "active_source_count")

  /** Build the command suite with watermark enrichment from a transport
    * frame: the per-topic message counts are aggregated distributed
    * ([[topicWatermarks]]) and only the per-topic totals — bounded by
    * topic count, control-plane size — reach the driver (reference:
    * base_command.py:103-127 loads the same per-topic range maps from the
    * Kafka admin API). */
  def withTransport(registry: SchemaRegistry, transport: DataFrame,
                    topicCol: String = "topic",
                    offsetCol: String = "offset"): Commands = {
    val counts = topicWatermarks(transport, topicCol, offsetCol)
      .select(col(topicCol), col("message_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    new Commands(registry, Some(counts.keySet), Some(counts))
  }

  /** Catalog-only command suite (no kafka state: `in_kafka` and
    * `message_count` columns absent, exactly like the reference when
    * kafka_topics/range maps are not passed to the model). */
  def catalogOnly(registry: SchemaRegistry): Commands =
    new Commands(registry, None, None)

  /** The introspector command suite (reference: tools/introspector/).
    * One instance per inspection session; the active-entity scans are
    * computed once and cached like the reference's `@cached_property`. */
  final class Commands(
      registry: SchemaRegistry,
      kafkaTopics: Option[Set[String]],
      messageCounts: Option[Map[String, Long]]) {

    // --- active entities (base_command.py:188-236) ---------------------

    /** Topics known to both the transport and the registry with ≥1
      * message (base_command.py:179-186 active_topics). */
    lazy val activeTopicNames: Set[String] = messageCounts
      .map(_.collect { case (t, n) if n > 0 && registry.getTopicByName(t).isDefined => t }.toSet)
      .getOrElse(Set.empty)

    /** source_id → active topic count (base_command.py:198-216). */
    lazy val activeSources: Map[Int, Int] =
      activeTopicNames.toSeq
        .flatMap(t => registry.getTopicByName(t))
        .flatMap(t => registry.getSourceByName(t.namespaceName, t.sourceName))
        .groupBy(_.sourceId).view.mapValues(_.size).toMap

    /** namespace → (active source count, active topic count)
      * (base_command.py:218-236). */
    lazy val activeNamespaces: Map[String, (Int, Int)] =
      activeSources.toSeq
        .flatMap { case (sid, n) => registry.getSourceById(sid).map(s => (s.namespaceName, n)) }
        .groupBy(_._1).view.mapValues(g => (g.size, g.map(_._2).sum)).toMap

    private def topicRow(t: registry.TopicEntry): TopicRow = {
      val pkeys = registry.getLatestSchemaByTopicName(t.name)
        .map(_.primaryKeys).getOrElse(Seq.empty)
      val count = messageCounts.map(_.getOrElse(t.name, 0L))
      TopicRow(t.name, t.topicId, t.containsPii, pkeys,
        // message_count > 0 implies in_kafka even if the name scan missed
        // it (models/topic.py:36-44)
        inKafka = kafkaTopics.map(_.contains(t.name) || count.exists(_ > 0L)),
        messageCount = count,
        sourceName = t.sourceName,
        sourceId = registry.getSourceByName(t.namespaceName, t.sourceName)
          .map(_.sourceId).getOrElse(0),
        namespace = t.namespaceName, clusterType = t.clusterType,
        createdAt = t.createdAt, updatedAt = t.createdAt)
    }

    private def sourceRow(s: registry.SourceEntry, withActive: Boolean): SourceRow =
      SourceRow(s.name, s.sourceId, s.ownerEmail, s.namespaceName,
        if (withActive) Some(activeSources.getOrElse(s.sourceId, 0)) else None)

    private def namespaceRow(name: String, withActive: Boolean): NamespaceRow = {
      val active = if (withActive) Some(activeNamespaces.getOrElse(name, (0, 0))) else None
      NamespaceRow(name, registry.namespaceId(name).getOrElse(0),
        active.map(_._1), active.map(_._2))
    }

    private def schemaRow(s: registry.SchemaEntry, includeTopic: Boolean): SchemaRow = {
      val latestTopic = registry.getLatestTopicBySource(s.namespaceName, s.sourceName)
      SchemaRow(s.schemaId, s.baseSchemaId,
        status = if (latestTopic.exists(_.name == s.topicName)) "RW" else "R",
        primaryKeys = s.primaryKeys, createdAt = s.createdAt,
        note = registry.getSchemaNote(s.schemaId), schemaJson = s.schemaJson,
        topic = if (includeTopic) registry.getTopicByName(s.topicName).map(topicRow)
                else None)
    }

    /** Stable secondary sort by a named field (Python's `list.sort` is
      * stable, so the reference's default ordering survives as the
      * tiebreak — `sorted`/`sortBy` on the JVM are stable too). */
    private def sortedByField[A](rows: Seq[A], fields: Seq[String],
                                 listType: String, sortBy: Option[String],
                                 descending: Boolean)(key: (A, String) => (Long, String)): Seq[A] =
      sortBy match {
        case None => rows
        case Some(f) =>
          require(fields.contains(f),
            s"You can not sort_by by $f for list type $listType. Possible fields are: $fields")
          val ord = Ordering.Tuple2(Ordering.Long, Ordering.String)
          // reversed Ordering, NOT .sorted.reverse — Python's
          // sort(reverse=True) is stable for equal keys and a post-hoc
          // reverse would flip tied rows out of the default order
          rows.sortBy(r => key(r, f))(if (descending) ord.reverse else ord)
      }

    private def boolKey(b: Boolean): Long = if (b) 1L else 0L

    // --- list commands (base_command.py:252-330) -----------------------

    /** `list topics` (base_command.py:252-281): by source id, or by
      * (namespace, source) criteria; default order updated_at descending,
      * then an optional stable sort by any listed field. */
    def listTopics(sourceId: Option[Int] = None,
                   sourceName: Option[String] = None,
                   namespaceName: Option[String] = None,
                   sortBy: Option[String] = None,
                   descendingOrder: Boolean = false): Seq[TopicRow] = {
      val base = sourceId match {
        case Some(id) =>
          val s = registry.getSourceById(id).getOrElse(
            throw new NoSuchElementException(s"no source $id"))
          registry.topicsBySource(s.namespaceName, s.name)
        case None =>
          registry.getTopicsByCriteria(namespace = namespaceName, source = sourceName)
      }
      val rows = base.map(topicRow)
        .sortBy(t => (t.updatedAt, t.topicId.toLong))(
          Ordering.Tuple2(Ordering.Long, Ordering.Long).reverse)
      sortedByField(rows, TopicFields, "topics", sortBy, descendingOrder) {
        case (t, "name") => (0L, t.name)
        case (t, "topic_id") => (t.topicId.toLong, "")
        case (t, "contains_pii") => (boolKey(t.containsPii), "")
        case (t, "primary_keys") => (0L, t.primaryKeys.mkString(","))
        case (t, "in_kafka") => (boolKey(t.inKafka.getOrElse(false)), "")
        case (t, "message_count") => (t.messageCount.getOrElse(0L), "")
        case (t, "source_name") => (0L, t.sourceName)
        case (t, "source_id") => (t.sourceId.toLong, "")
        case (t, "namespace") => (0L, t.namespace)
        case (t, "created_at") => (t.createdAt, "")
        case (t, "updated_at") => (t.updatedAt, "")
        case (_, other) => throw new IllegalStateException(s"unhandled sort field $other")
      }
    }

    /** `list sources` (base_command.py:283-311): one namespace or all;
      * default order source_id descending. */
    def listSources(namespaceName: Option[String] = None,
                    sortBy: Option[String] = None,
                    descendingOrder: Boolean = false,
                    activeSources: Boolean = false): Seq[SourceRow] = {
      val base = namespaceName match {
        case Some(ns) => registry.sourcesByNamespace(ns)
        case None => registry.allSources
      }
      val rows = base.map(sourceRow(_, activeSources))
        .sortBy(_.sourceId)(Ordering.Int.reverse)
      sortedByField(rows, SourceFields, "sources", sortBy, descendingOrder) {
        case (s, "name") => (0L, s.name)
        case (s, "source_id") => (s.sourceId.toLong, "")
        case (s, "owner_email") => (0L, s.ownerEmail)
        case (s, "namespace") => (0L, s.namespace)
        case (s, "active_topic_count") => (s.activeTopicCount.getOrElse(0).toLong, "")
        case (_, other) => throw new IllegalStateException(s"unhandled sort field $other")
      }
    }

    /** `list namespaces` (base_command.py:313-330): default order
      * namespace_id descending. */
    def listNamespaces(sortBy: Option[String] = None,
                       descendingOrder: Boolean = false,
                       activeNamespaces: Boolean = false): Seq[NamespaceRow] = {
      val names = registry.allSources.map(_.namespaceName).distinct
      val rows = names.map(namespaceRow(_, activeNamespaces))
        .sortBy(_.namespaceId)(Ordering.Int.reverse)
      sortedByField(rows, NamespaceFields, "namespaces", sortBy, descendingOrder) {
        case (n, "name") => (0L, n.name)
        case (n, "namespace_id") => (n.namespaceId.toLong, "")
        case (n, "active_topic_count") => (n.activeTopicCount.getOrElse(0).toLong, "")
        case (n, "active_source_count") => (n.activeSourceCount.getOrElse(0).toLong, "")
        case (_, other) => throw new IllegalStateException(s"unhandled sort field $other")
      }
    }

    /** `list schemas` of a topic, created_at descending
      * (info/topic.py:46-53). */
    def listSchemas(topicName: String): Seq[SchemaRow] =
      registry.schemasByTopic(topicName).map(schemaRow(_, includeTopic = false))
        .sortBy(s => (s.createdAt, s.schemaId.toLong))(
          Ordering.Tuple2(Ordering.Long, Ordering.Long).reverse)

    // --- info commands (info/{namespace,source,topic}.py) --------------

    /** `info namespace NAME` (info/namespace.py:56-73): the namespace row
      * plus its sources. */
    def infoNamespace(name: String, activeNamespaces: Boolean = false): NamespaceInfo = {
      require(registry.allSources.exists(_.namespaceName == name),
        "Given namespace doesn't exist")
      NamespaceInfo(namespaceRow(name, activeNamespaces),
        listSources(namespaceName = Some(name)))
    }

    /** `info source` by id, or by name + namespace (info/source.py:44-72;
      * id wins and namespace is ignored, base_command.py:131-146). */
    def infoSource(sourceId: Option[Int] = None,
                   sourceName: Option[String] = None,
                   namespaceName: Option[String] = None,
                   activeSources: Boolean = false): SourceInfo = {
      val src = sourceId match {
        case Some(id) => registry.getSourceById(id).getOrElse(
          throw new IllegalArgumentException("Given SOURCE_NAME|NAMESPACE_NAME doesn't exist"))
        case None =>
          val ns = namespaceName.getOrElse(throw new IllegalArgumentException(
            "--namespace must be provided when given a source name as source identifier."))
          registry.sourcesByNamespace(ns).find(s => sourceName.contains(s.name))
            .getOrElse(throw new IllegalArgumentException(
              "Given SOURCE_NAME|NAMESPACE_NAME doesn't exist"))
      }
      val topics = listTopics(sourceId = Some(src.sourceId))
      val row = sourceRow(src, withActive = false)
      SourceInfo(
        if (activeSources) row.copy(activeTopicCount =
          Some(topics.count(_.messageCount.exists(_ > 0L))))
        else row,
        topics)
    }

    /** `info topic NAME` (info/topic.py:36-44): the topic row plus its
      * schemas, newest first, notes attached. */
    def infoTopic(name: String): TopicInfo = {
      val t = registry.getTopicByName(name).getOrElse(
        throw new IllegalArgumentException(s"Given topic doesn't exist: $name"))
      TopicInfo(topicRow(t), listSchemas(name))
    }

    // --- register commands (register/{avro,mysql}_command.py) ----------

    /** `register avro` (register/avro_command.py:58-79): delegates to the
      * registry and returns the schema with its topic attached (the
      * reference's print_schema include_topic_info=True shape). */
    def registerAvro(namespace: String, sourceName: String, avroSchema: String,
                     sourceOwnerEmail: String, containsPii: Boolean = false,
                     clusterType: String = "datapipe",
                     baseSchemaId: Option[Int] = None): SchemaRow =
      schemaRow(registry.registerSchema(namespace, sourceName, avroSchema,
        containsPii, baseSchemaId, sourceOwnerEmail, clusterType),
        includeTopic = true)

    /** `register mysql` (register/mysql_command.py:55-78): new create
      * table + optional old create/alter triple through the DDL
      * converter. */
    def registerMysql(namespace: String, sourceName: String,
                      createTable: String,
                      oldCreateTable: Option[String] = None,
                      alterTable: Option[String] = None,
                      sourceOwnerEmail: String = "",
                      containsPii: Boolean = false): SchemaRow =
      schemaRow(registry.registerSchemaFromMysqlStmts(namespace, sourceName,
        createTable, oldCreateTable, alterTable, containsPii, sourceOwnerEmail),
        includeTopic = true)

    // --- schema-check (schema_check_command.py:1-65) -------------------

    /** Mutual read compatibility of the candidate schema against EVERY
      * schema of the source across all its topics
      * (schematizer.py:1191-1210: "backward and forward compatible with
      * all enabled schemas of given source"). */
    def schemaCheck(avroSchema: String, sourceName: String,
                    namespaceName: String): Boolean = {
      val parsed = graft.functions.AvroCodec.parse(avroSchema)
      registry.topicsBySource(namespaceName, sourceName)
        .flatMap(t => registry.schemasByTopic(t.name))
        .forall(s => registry.isFullyCompatible(parsed,
          graft.functions.AvroCodec.parse(s.schemaJson)))
    }
  }
}
