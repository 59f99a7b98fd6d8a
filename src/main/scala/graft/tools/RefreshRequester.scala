package graft.tools

import graft.refresh.RefreshJob
import graft.schema.SchemaRegistry

/** Full-refresh requester: the validated create-refresh entry point over
  * the registry's refresh CRUD (reference:
  * data_pipeline/tools/refresh_requester.py:46-184 — same option surface,
  * same validation failures, same Priority name→value mapping from
  * schematizer_clientlib/models/refresh.py:63-70).
  *
  * Validation rules, in the reference's order:
  *  - avg_rows_per_second_cap, when present, must be > 0;
  *  - batch_size must be > 0;
  *  - either source_id, or BOTH source_name and namespace, must be given;
  *  - source_id is mutually exclusive with source_name/namespace;
  *  - a (namespace, source_name) pair must resolve to exactly one source —
  *    zero and more-than-one are both errors (the latter "somehow"
  *    case the reference flags for investigation).
  */
object RefreshRequester {

  /** Priority names (reference Priority enum: LOW=25 … MAX=100). */
  val Priorities: Map[String, Int] =
    Map("LOW" -> 25, "MEDIUM" -> 50, "HIGH" -> 75, "MAX" -> 100)

  /** One parsed command line (defaults = the reference's option defaults). */
  final case class Request(
      sourceId: Option[Int] = None,
      sourceName: Option[String] = None,
      namespace: Option[String] = None,
      offset: Long = 0L,
      batchSize: Int = 500,
      priority: String = "MEDIUM",
      filterCondition: Option[String] = None,
      avgRowsPerSecondCap: Option[Int] = None)

  /** Validate `req` and register the refresh job. Throws
    * IllegalArgumentException with reference-mirroring messages on every
    * invalid combination; returns the created catalog row otherwise. */
  def request(registry: SchemaRegistry, req: Request): RefreshJob = {
    require(req.avgRowsPerSecondCap.forall(_ > 0),
      "avg-rows-per-second-cap must be greater than 0")
    require(req.batchSize > 0, "batch-size option must be greater than 0")
    require(req.sourceId.nonEmpty ||
        (req.sourceName.nonEmpty && req.namespace.nonEmpty),
      "source-id or both of source-name and namespace must be defined")
    require(req.sourceId.isEmpty ||
        (req.sourceName.isEmpty && req.namespace.isEmpty),
      "cannot use both source-id and either of namespace and source-name")
    val resolved = req.sourceId match {
      case Some(id) =>
        registry.allSources.find(_.sourceId == id).getOrElse(
          throw new IllegalArgumentException(s"found no source with id $id"))
      case None =>
        val matches = registry.sourcesByNamespace(req.namespace.get)
          .filter(_.name == req.sourceName.get)
        require(matches.nonEmpty,
          s"found no sources with namespace_name ${req.namespace.get} " +
            s"and source_name ${req.sourceName.get}")
        require(matches.size == 1,
          s"pair of namespace_name ${req.namespace.get} and source_name " +
            s"${req.sourceName.get} somehow received more than one source")
        matches.head
    }
    // priority resolves AFTER the source (reference parity: the Priority
    // enum lookup only happens inside create_request, past source
    // validation — refresh_requester.py:117-162 — so when both are
    // invalid the source error wins)
    val priority = Priorities.getOrElse(req.priority,
      throw new IllegalArgumentException(
        s"priority must be one of ${Priorities.keys.toSeq.sorted.mkString(", ")}: " +
          req.priority))
    registry.createRefresh(resolved.namespaceName, resolved.name,
      req.offset, req.batchSize, priority,
      req.filterCondition, req.avgRowsPerSecondCap)
  }
}
