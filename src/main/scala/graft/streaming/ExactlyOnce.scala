package graft.streaming

/** Exactly-once publish audit (reference: producer.py:291-422
  * `ensure_messages_published`, _producer_retry.py:120-182 watermark
  * verification).
  *
  * Structured Streaming checkpoints + an idempotent/transactional sink
  * give exactly-once for the Spark-managed path; this audit covers the
  * reference's stronger case — an EXTERNAL upstream position (e.g. a
  * binlog offset) is the source of truth and the process died between
  * sink-commit and position-save. On restart the replay window is
  * reconciled against the sink's high watermarks: rows already at the
  * sink are skipped, only the tail re-publishes, and a watermark beyond
  * the replay window is unrecoverable (data was published that we can no
  * longer account for).
  */
object ExactlyOnce {

  final case class TopicState(savedOffset: Long, highWatermark: Long)

  sealed trait Decision
  /** Re-publish messages from index `fromIndex` (0-based) of the replay
    * buffer; earlier ones are already at the sink. */
  final case class RepublishFrom(fromIndex: Int) extends Decision
  /** Watermark moved beyond what the replay buffer can explain. */
  final case class Unensurable(alreadyPublished: Long, replaySize: Int) extends Decision

  /** How many of the replayed messages already made it to the sink
    * (reference: producer.py:361-377 already_published_count). */
  def alreadyPublishedCount(state: TopicState): Long =
    state.highWatermark - state.savedOffset

  /** Reconcile one topic's replay buffer against the sink watermark.
    * @param replaySize number of messages in the unclean-shutdown replay
    *                   buffer for this topic
    */
  def reconcile(state: TopicState, replaySize: Int,
                allowForcedRecovery: Boolean = false): Decision = {
    val already = alreadyPublishedCount(state)
    if (already < 0 || already > replaySize) {
      // watermark regressed (sink reset) or advanced past the buffer:
      // both mean the buffer cannot explain the sink state.
      if (allowForcedRecovery) RepublishFrom(0)
      else Unensurable(already, replaySize)
    } else {
      RepublishFrom(already.toInt)
    }
  }

  /** Reconcile every topic of an unclean-shutdown replay at once
    * (reference: producer.py:291-422 walks the whole
    * topic → message-list map; one unensurable topic aborts the recovery
    * unless forced). */
  def reconcileAll(states: Map[String, (TopicState, Int)],
                   allowForcedRecovery: Boolean = false): Map[String, Decision] =
    states.map { case (topic, (st, n)) =>
      topic -> reconcile(st, n, allowForcedRecovery)
    }

  /** Retry verification for a failed produce request (reference:
    * _producer_retry.py:120-182): a "failed" request whose message count
    * exactly closed the watermark gap actually succeeded — treat the
    * at-least-once retry as a duplicate and skip it. */
  def retrySucceededDespiteError(
      preRequestWatermark: Long,
      postRequestWatermark: Long,
      requestSize: Int): Boolean =
    postRequestWatermark - preRequestWatermark == requestSize
}
