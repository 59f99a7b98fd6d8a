package graft.core

/** CDC message taxonomy of the pipeline envelope.
  *
  * Mirrors the reference's public/protected split and wire ordinals
  * (reference: data_pipeline/message_type.py:33-68 — public: log=0,
  * create=1, update=2, delete=3, refresh=4; protected: heartbeat=5,
  * monitor=6, registration=7).
  */
sealed abstract class MessageType(val name: String, val ordinal: Int, val isProtected: Boolean) {
  override def toString: String = name
}

object MessageType {
  case object Log extends MessageType("log", 0, false)
  case object Create extends MessageType("create", 1, false)
  case object Update extends MessageType("update", 2, false)
  case object Delete extends MessageType("delete", 3, false)
  case object Refresh extends MessageType("refresh", 4, false)
  case object Heartbeat extends MessageType("heartbeat", 5, true)
  case object Monitor extends MessageType("monitor", 6, true)
  case object Registration extends MessageType("registration", 7, true)

  val all: Seq[MessageType] =
    Seq(Log, Create, Update, Delete, Refresh, Heartbeat, Monitor, Registration)
  val public: Seq[MessageType] = all.filterNot(_.isProtected)
  private val byName = all.map(t => t.name -> t).toMap

  def fromName(name: String): MessageType =
    byName.getOrElse(name, throw new IllegalArgumentException(s"unknown message type: $name"))

  /** Update messages carry a previous_payload; nothing else may
    * (reference: message.py:673-809). */
  def requiresPreviousPayload(t: MessageType): Boolean = t == Update
}
