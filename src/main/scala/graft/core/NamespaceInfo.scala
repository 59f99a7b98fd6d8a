package graft.core

/** Namespace name convention `<env>.<cluster>.<database>[.<suffixes>…]`
  * (reference: data_pipeline/_namespace_util.py:22-173 — parse/build with
  * environment detection).
  */
final case class NamespaceInfo(
    environment: Option[String],
    cluster: String,
    database: String,
    suffixes: Seq[String]) {
  def name: String =
    (environment.toSeq ++ Seq(cluster, database) ++ suffixes).mkString(".")
}

object NamespaceInfo {

  /** Environments recognized as a leading component. */
  val KnownEnvironments: Set[String] = Set("main", "dev", "stage", "test")

  /** Parse `env.cluster.db.suffixes…` / `cluster.db.suffixes…`. */
  def parse(name: String): NamespaceInfo = {
    val parts = name.split("\\.").toSeq
    require(parts.size >= 2 && parts.forall(_.nonEmpty), s"bad namespace: $name")
    if (KnownEnvironments.contains(parts.head)) {
      require(parts.size >= 3, s"namespace with environment needs cluster+db: $name")
      NamespaceInfo(Some(parts.head), parts(1), parts(2), parts.drop(3))
    } else {
      NamespaceInfo(None, parts.head, parts(1), parts.drop(2))
    }
  }
}
