package graft.streaming

import graft.schema.SchemaRegistry

/** Registry-driven topic discovery (reference: consumer_source.py:27-265 —
  * the nine ConsumerSource variants; refresh tick consumer.py:270-294).
  *
  * Structured Streaming cannot mutate a running query's topic set, so
  * discovery is a two-part design: resolvers compute the topic set from
  * the registry, and [[TopicRefreshController]] diffs successive
  * resolutions — a change means drain + checkpoint + restart the query
  * with the new subscription (same offsets semantics as the reference's
  * stop/commit/re-plan cycle).
  */
sealed trait ConsumerSource {
  def resolve(registry: SchemaRegistry): Set[String]

  /** Incremental sources resolve only the *new* topics each tick (the
    * NewTopicsOnly family); the controller appends them to the running
    * subscription instead of replacing it (reference:
    * base_consumer.py:829-882 refresh_new_topics vs :884-947
    * refresh_topics). */
  def incremental: Boolean = false

  /** Two-phase discovery: `resolve` must be a side-effect-free PREVIEW;
    * the controller calls `commit()` only after the refreshed
    * subscription passed validation. A stateful (new-topics-only) source
    * that advanced its cutoff inside resolve() would permanently LOSE
    * every topic surfaced by a tick whose cluster-type validation then
    * failed — valid topics included. Default no-op for stateless
    * sources. */
  def commit(): Unit = ()
}

object ConsumerSource {

  /** A consumer's resolved topic set spans more than one kafka cluster
    * type (reference: base_consumer.py:44-50 MultipleClusterTypeError —
    * one consumer connection can only talk to one cluster). */
  final class MultipleClusterTypeError(clusterTypes: Seq[String])
      extends RuntimeException(
        "Consumer can not process topics from different kafka cluster " +
          "types, i.e. (" + clusterTypes.mkString(", ") + ").")

  /** Checks that every registered topic in the set declares the same
    * cluster type and returns it (reference: base_consumer.py:238-256
    * _determine_cluster_type_from_topics — re-run on every topic refresh,
    * base_consumer.py:320-321). Topics the registry doesn't know carry no
    * cluster type and can't conflict; None when nothing is registered. */
  def determineClusterType(registry: SchemaRegistry,
                           topicNames: Set[String]): Option[String] = {
    var clusterType: Option[String] = None
    topicNames.toSeq.sorted.foreach { name =>
      registry.getTopicByName(name).foreach { t =>
        clusterType match {
          case None => clusterType = Some(t.clusterType)
          case Some(c) if c != t.clusterType =>
            throw new MultipleClusterTypeError(Seq(c, t.clusterType))
          case _ =>
        }
      }
    }
    clusterType
  }

  /** Explicit topic list (reference: FixedTopics). */
  final case class FixedTopics(topics: Set[String]) extends ConsumerSource {
    def resolve(registry: SchemaRegistry): Set[String] = topics
  }

  /** All topics of the given namespaces (TopicsInFixedNamespaces). */
  final case class TopicsInNamespaces(namespaces: Set[String]) extends ConsumerSource {
    def resolve(registry: SchemaRegistry): Set[String] =
      registry.topics.filter(t => namespaces.contains(t.namespaceName)).map(_.name).toSet
  }

  /** All topics of one source (TopicInSource). */
  final case class TopicsInSource(namespace: String, source: String) extends ConsumerSource {
    def resolve(registry: SchemaRegistry): Set[String] =
      registry.topicsBySource(namespace, source).map(_.name).toSet
  }

  /** Only the newest topic of one source (NewTopicOnlyInSource). */
  final case class LatestTopicInSource(namespace: String, source: String) extends ConsumerSource {
    def resolve(registry: SchemaRegistry): Set[String] =
      registry.getLatestTopicBySource(namespace, source).map(_.name).toSet
  }

  /** Topics owning the given schema ids, with those ids forced as reader
    * schemas (FixedSchemas — reference: consumer_source.py:120-147). */
  final case class FixedSchemas(schemaIds: Set[Int]) extends ConsumerSource {
    /** Unknown schema ids fail LOUDLY (reference parity: the
      * schematizer raises on an unregistered id): silently dropping a
      * typo'd id produced a consumer missing a topic — or an empty
      * subscription failing later with an unrelated error. */
    def resolve(registry: SchemaRegistry): Set[String] = {
      val unknown = schemaIds.filter(registry.getSchemaById(_).isEmpty)
      require(unknown.isEmpty,
        s"FixedSchemas: unknown schema ids ${unknown.toSeq.sorted.mkString(",")}")
      schemaIds.flatMap(id => registry.getSchemaById(id).map(_.topicName))
    }
    /** topic → forced reader schema id. Two requested schema ids living
      * on the SAME topic would silently force an arbitrary one of them
      * (hash-order last-write-wins) — refused loudly instead: a consumer
      * can pin exactly one reader per topic. */
    def readerSchemaByTopic(registry: SchemaRegistry): Map[String, Int] = {
      val pairs = schemaIds.toSeq
        .flatMap(id => registry.getSchemaById(id).map(_.topicName -> id))
      pairs.groupBy(_._1).foreach { case (topic, ids) =>
        require(ids.size == 1,
          s"FixedSchemas pins ${ids.map(_._2).sorted.mkString(",")} on the " +
            s"same topic $topic — one reader schema per topic")
      }
      pairs.toMap
    }
  }

  /** Topics feeding a data target via its consumer groups
    * (TopicInDataTarget — reference: consumer_source.py). */
  final case class TopicsInDataTarget(dataTargetId: Int) extends ConsumerSource {
    def resolve(registry: SchemaRegistry): Set[String] =
      registry.topicsByDataTarget(dataTargetId).map(_.name).toSet
  }

  /** Topics created after a fixed registry tick. */
  final case class TopicsCreatedAfter(tick: Long) extends ConsumerSource {
    def resolve(registry: SchemaRegistry): Set[String] =
      registry.topicsCreatedAfter(tick).map(_.name).toSet
  }

  /** New-topics-only in fixed namespaces, tracked per namespace
    * (reference: NewTopicsOnlyInFixedNamespaces, consumer_source.py:167-196):
    * each resolution remembers the registry clock per namespace and
    * returns only topics created at-or-after the previous resolution
    * (inclusive boundary, like the reference — an occasional re-resolve
    * beats a missed topic). First resolution returns the namespace's full
    * topic set. */
  final class NewTopicsOnlyInNamespaces(namespaces: Set[String]) extends ConsumerSource {
    private val lastQueryTick = scala.collection.mutable.Map.empty[String, Long]
    private var pending = Map.empty[String, Long]
    override def incremental: Boolean = true
    def resolve(registry: SchemaRegistry): Set[String] = synchronized {
      val now = registry.currentTick
      val out = namespaces.flatMap { ns =>
        val cutoff = lastQueryTick.get(ns)
        registry.topics
          .filter(t => t.namespaceName == ns && cutoff.forall(t.createdAt >= _))
          .map(_.name)
      }
      pending = namespaces.iterator.map(_ -> now).toMap
      out
    }
    override def commit(): Unit = synchronized {
      pending.foreach { case (ns, t) => lastQueryTick(ns) = t }
      pending = Map.empty
    }
  }

  /** New-topics-only scoped to one source (reference: NewTopicOnlyInSource,
    * consumer_source.py:199-229). */
  final class NewTopicsOnlyInSource(namespace: String, source: String) extends ConsumerSource {
    private var lastQueryTick: Option[Long] = None
    private var pending: Option[Long] = None
    override def incremental: Boolean = true
    def resolve(registry: SchemaRegistry): Set[String] = synchronized {
      pending = Some(registry.currentTick)
      registry.topicsBySource(namespace, source)
        .filter(t => lastQueryTick.forall(t.createdAt >= _))
        .map(_.name).toSet
    }
    override def commit(): Unit = synchronized {
      pending.foreach(t => lastQueryTick = Some(t))
      pending = None
    }
  }

  /** New-topics-only scoped to a data target's consumer-group sources
    * (reference: NewTopicOnlyInDataTarget, consumer_source.py:232-265). */
  final class NewTopicsOnlyInDataTarget(dataTargetId: Int) extends ConsumerSource {
    private var lastQueryTick: Option[Long] = None
    private var pending: Option[Long] = None
    override def incremental: Boolean = true
    def resolve(registry: SchemaRegistry): Set[String] = synchronized {
      pending = Some(registry.currentTick)
      registry.topicsByDataTarget(dataTargetId)
        .filter(t => lastQueryTick.forall(t.createdAt >= _))
        .map(_.name).toSet
    }
    override def commit(): Unit = synchronized {
      pending.foreach(t => lastQueryTick = Some(t))
      pending = None
    }
  }
}

/** Diffs successive topic resolutions; a non-empty diff signals the query
  * restart (reference semantics: base_consumer.py:829-947
  * refresh_new_topics / refresh_topics). */
final class TopicRefreshController(source: ConsumerSource, registry: SchemaRegistry) {

  @volatile private var current: Set[String] = Set.empty
  @volatile private var currentClusterType: Option[String] = None

  final case class Refresh(added: Set[String], removed: Set[String], topics: Set[String]) {
    def changed: Boolean = added.nonEmpty || removed.nonEmpty
  }

  def currentTopics: Set[String] = current

  /** Cluster type of the current subscription, once one registered topic
    * has resolved (reference: base_consumer.py:227-229). */
  def clusterType: Option[String] = currentClusterType

  /** One discovery tick. Returns the diff; caller restarts the streaming
    * query iff `changed`. Incremental (NewTopicsOnly) sources append to
    * the running subscription — topics are never dropped by a tick that
    * simply found nothing new.
    *
    * The refreshed subscription is re-validated for cluster-type
    * uniformity before it is accepted, exactly like the reference
    * re-determines the cluster type on every topic refresh
    * (base_consumer.py:320-321): a registry where a source forked onto a
    * different cluster since the last tick fails the tick instead of
    * silently subscribing one consumer to two clusters. */
  def tick(): Refresh = synchronized {
    val resolved = source.resolve(registry)
    val next = if (source.incremental) current ++ resolved else resolved
    // validate BEFORE committing the source's discovery cutoff: a failed
    // tick must leave the source able to re-surface the same topics next
    // tick (a cutoff advanced on failure would lose them forever)
    val nextClusterType = ConsumerSource.determineClusterType(registry, next)
    source.commit()
    val refresh = Refresh(next -- current, current -- next, next)
    current = next
    currentClusterType = nextClusterType
    refresh
  }
}
