package graft.tools

import graft.schema.SchemaRegistry

/** Log-compaction policy management (reference:
  * tools/compaction_setter.py:33-153): select every registry topic whose
  * latest schema declares primary keys (compaction is only meaningful when
  * messages carry stable keys), then set `cleanup.policy=compact` on each —
  * unless some policy is already set (a manual override must win), or the
  * topic doesn't exist in the cluster.
  *
  * The config store is abstract: in production it's the Kafka AdminClient's
  * `alterConfigs`; tests use a map. The decision structure (compacted /
  * skipped / missed, dry-run) is the part worth owning — it is identical to
  * the reference's.
  */
object CompactionSetter {

  val CleanupPolicyKey = "cleanup.policy"
  val CompactPolicy = "compact"

  /** Kafka topic-config surface (AdminClient analog). `get` returns None
    * for topics the cluster doesn't know. */
  trait TopicConfigStore {
    def getConfig(topic: String): Option[Map[String, String]]
    def setConfig(topic: String, config: Map[String, String]): Unit
  }

  final case class Result(
      compacted: Seq[String],
      skipped: Seq[String],
      missed: Seq[String])

  /** Topics eligible for compaction: the whitelist topic if given, else
    * every registry topic — filtered to those with primary keys. */
  def topicsToCompact(registry: SchemaRegistry,
                      whitelistTopic: Option[String] = None): Seq[String] = {
    val candidates = whitelistTopic match {
      case Some(t) => Seq(t)
      case None => registry.getTopicsByCriteria().map(_.name)
    }
    registry.filterTopicsByPkeys(candidates)
  }

  /** Apply `cleanup.policy=compact` where no policy is set; report what
    * was compacted / skipped (pre-existing policy) / missed (unknown
    * topic). Dry-run computes the same report without writing. */
  def applyLogCompaction(store: TopicConfigStore, topics: Seq[String],
                         dryRun: Boolean = false): Result = {
    val (compacted, skipped, missed) =
      topics.foldLeft((Vector.empty[String], Vector.empty[String], Vector.empty[String])) {
        case ((c, s, m), topic) =>
          store.getConfig(topic) match {
            case None => (c, s, m :+ topic)
            case Some(cfg) if cfg.contains(CleanupPolicyKey) => (c, s :+ topic, m)
            case Some(cfg) =>
              if (!dryRun) store.setConfig(topic, cfg + (CleanupPolicyKey -> CompactPolicy))
              (c :+ topic, s, m)
          }
      }
    Result(compacted, skipped, missed)
  }
}
