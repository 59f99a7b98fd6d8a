package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication — the online form of the batch
  * `d_exact_dedup` operator for an ingest pipeline that must admit each
  * document's FIRST occurrence and drop replays, while data is still
  * arriving (the batch operator answers the same question after the
  * fact).
  *
  * Two formulations with the same admit-first-occurrence contract:
  *
  *  - [[dedupWithinWatermark]]: Spark's `dropDuplicatesWithinWatermark`
  *    on the content hash. State per distinct hash is dropped once the
  *    watermark passes its first-seen event time plus the delay, so
  *    state size tracks the distinct-hash arrival rate inside the
  *    lateness horizon — bounded forever, the property that keeps a
  *    100 TB/day ingest runnable. The trade: a duplicate arriving AFTER
  *    its original's state expired is re-admitted (dedup horizon =
  *    watermark delay), which is the standard streaming-dedup contract.
  *  - [[dedupCounting]]: `flatMapGroupsWithState` keyed on the hash,
  *    emitting each admitted document WITH its replay count at admission
  *    horizon end — the observability variant (how duplicated was the
  *    stream?) the built-in cannot express. Same event-time-timeout
  *    state bound.
  *
  * Only the 8-byte xxhash64 content hash (plus, in the counting form, a
  * small struct) ever enters the state store — never document text, the
  * same discipline as every batch dedup here (hash granularity: 2⁻⁶⁴
  * collision odds, the d_exact_dedup trade).
  */
object StreamingDedup {

  case class Doc(doc_id: Long, ts: Timestamp, text: String)

  case class AdmittedDoc(
      doc_id: Long,
      first_ts: Timestamp,
      n_replays: Long)

  // public: the state encoder's generated code constructs/reads it
  case class SeenState(docId: Long, firstMs: Long, replays: Long)

  /** First occurrence per content hash within the watermark horizon.
    * Emits the admitted rows (doc_id, ts, h); duplicates inside the
    * horizon are dropped, text is dropped before the stateful operator
    * so only (id, ts, hash) rows reach the state store. */
  def dedupWithinWatermark(docs: DataFrame, delay: String): DataFrame =
    docs
      .select(col("doc_id"), col("ts"), xxhash64(col("text")).as("h"))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("h")

  /** Admission with replay observability: each distinct content hash is
    * emitted ONCE — when the watermark passes its first occurrence plus
    * the horizon — carrying the first-seen doc id/time and how many
    * replays arrived inside the horizon. Late duplicates beyond the
    * watermark are dropped by Spark before the state function runs. */
  def dedupCounting(docs: Dataset[Doc], delay: String): Dataset[AdmittedDoc] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id"), col("ts"), col("text"))
      .withColumn("h", xxhash64(col("text")))
      .select(col("h"), col("doc_id"), col("ts"))
      .as[(Long, Long, Timestamp)]
      .withWatermark("ts", delay)
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: Long, rows: Iterator[(Long, Long, Timestamp)],
         state: GroupState[SeenState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(AdmittedDoc(s.docId, new Timestamp(s.firstMs), s.replays))
          } else {
            // first occurrence = smallest (ts, doc_id) seen so far —
            // within a batch the iterator is unordered, so fold min
            val batch = rows.toSeq
            val incoming = batch.minBy(r => (r._3.getTime, r._2))
            val next = state.getOption match {
              case None =>
                SeenState(incoming._2, incoming._3.getTime, batch.size.toLong - 1L)
              case Some(s) =>
                val better = incoming._3.getTime < s.firstMs ||
                  (incoming._3.getTime == s.firstMs && incoming._2 < s.docId)
                SeenState(
                  if (better) incoming._2 else s.docId,
                  if (better) incoming._3.getTime else s.firstMs,
                  s.replays + batch.size.toLong - (if (better) 1L else 0L))
            }
            state.update(next)
            // admit at horizon end: the timeout fires once the watermark
            // passes first-seen (i.e. ~`delay` after it in event time),
            // making the replay count final for the horizon; clamped to
            // the current watermark because Spark rejects timeouts in
            // the past (a replay arriving near the horizon's edge would
            // otherwise re-arm an already-passed timestamp)
            state.setTimeoutTimestamp(
              math.max(next.firstMs + 1L, state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
        })
  }
}
