package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate CANDIDATE detection — the online form of the
  * batch MinHash+LSH pipeline (`Dedup.minhashSignaturesFast` →
  * `lshBandsFast` → `bucketPairs`), for an ingest that must flag "this
  * document collides with something already seen" while data is still
  * arriving.
  *
  * Same banding math as batch: per document, k xxhash64 minhash
  * signatures over its word shingles, cut into bands; two documents
  * sharing any band code are candidates. The streaming twist is state:
  * instead of a corpus-wide bucket-join, each (band, code) key holds the
  * FIRST document that produced it — `flatMapGroupsWithState` with an
  * event-time timeout, so a bucket's state lives exactly one lateness
  * horizon past its last update and the store is bounded by the distinct
  * band codes inside the horizon, never corpus history. A later arrival
  * in the bucket emits a (first_id, new_id, band) candidate row.
  *
  * Only (8-byte code key → first doc id + timestamp) enters the state
  * store — never text, never signatures (the StreamingDedup discipline).
  * Candidates are exactly the batch `bucketPairs` pairs restricted to
  * "vs the bucket's first occupant" — the O(bucket) candidate fan-out a
  * stream can afford; verification (exact Jaccard / cosine) belongs
  * downstream in `foreachBatch` against a vector store, the same split
  * the batch pipeline makes between bucketPairs and its verify stage.
  */
object StreamingNearDup {

  case class Doc(doc_id: Long, ts: Timestamp, text: String)

  case class Candidate(first_id: Long, new_id: Long, band_id: Int)

  case class Confirmed(first_id: Long, new_id: Long, n_bands: Long, jaccard: Double)

  // public: the state encoder's generated code constructs/reads it
  case class BucketState(firstId: Long, lastMs: Long)

  /** (doc_id, ts, band_id, code) — k minhashes over `shingleN`-word
    * shingles, banded; the streaming-side mirror of
    * minhashSignaturesFast + lshBandsFast (same xxhash64(i, g) family,
    * same band coding), as one shuffle-free projection. */
  private[graft] def bandCodes(docs: DataFrame, k: Int, bands: Int,
                               shingleN: Int): DataFrame = {
    val rowsPerBand = k / bands
    require(bands * rowsPerBand == k, s"bands=$bands must divide k=$k")
    val ws = split(trim(col("text")), "\\s+")
    val grams = expr(
      s"""array_distinct(transform(sequence(1, size(__ws) - ${shingleN - 1}),
            i -> concat_ws(' ', ${(0 until shingleN).map(o => s"element_at(__ws, i + $o)").mkString(", ")})))""")
    val sigs = (0 until k).map(i =>
      expr(s"array_min(transform(__g, g -> xxhash64($i, g)))").as(s"s$i"))
    val bandCols = (0 until bands).map { b =>
      val sigCols = (0 until rowsPerBand).map(r => col(s"s${b * rowsPerBand + r}"))
      struct(lit(b).as("band_id"), xxhash64(lit(b) +: sigCols: _*).as("code"))
    }
    docs
      .select(col("doc_id"), col("ts"), ws.as("__ws"))
      .filter(size(col("__ws")) >= shingleN)
      .select(col("doc_id"), col("ts"), grams.as("__g"))
      .select(col("doc_id") +: col("ts") +: sigs: _*)
      .select(col("doc_id"), col("ts"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("ts"), col("b.band_id"), col("b.code"))
  }

  /** Candidate pairs against each band bucket's first occupant, within
    * the watermark horizon. Emits one row per (band, code) collision of
    * a new document with the bucket's first; a document colliding with
    * the same first in several bands emits one row per band (downstream
    * dedups as it verifies — collision multiplicity is signal). */
  def candidates(docs: Dataset[Doc], delay: String,
                 k: Int = 8, bands: Int = 4,
                 shingleN: Int = 3): Dataset[Candidate] = {
    import docs.sparkSession.implicits._
    bandCodes(docs.toDF(), k, bands, shingleN)
      .withWatermark("ts", delay)
      .as[(Long, Timestamp, Int, Long)]
      .groupByKey { case (_, _, bandId, code) => (bandId, code) }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: (Int, Long), rows: Iterator[(Long, Timestamp, Int, Long)],
         state: GroupState[BucketState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toSeq.sortBy(r => (r._2.getTime, r._1))
            val out = scala.collection.mutable.ArrayBuffer.empty[Candidate]
            var st = state.getOption
            batch.foreach { case (id, ts, bandId, _) =>
              st match {
                case None =>
                  st = Some(BucketState(id, ts.getTime))
                case Some(s) =>
                  if (id != s.firstId) out += Candidate(s.firstId, id, bandId)
                  st = Some(s.copy(lastMs = math.max(s.lastMs, ts.getTime)))
              }
            }
            st.foreach { s =>
              state.update(s)
              // expire one horizon past the bucket's last activity;
              // clamped forward because Spark rejects past timeouts
              state.setTimeoutTimestamp(
                math.max(s.lastMs + 1L, state.getCurrentWatermarkMs() + 1L))
            }
            out.iterator
          }
        })
  }

  /** Batch-side verification of one micro-batch of [[candidates]]: the
    * downstream half of the candidate/verify split, identical in rule to
    * the batch pipeline's `bucketPairs` → [[graft.operators.Dedup
    * .verifyJaccard]] stage. Band collisions collapse to distinct
    * (first_id, new_id) pairs (multiplicity kept as `n_bands` — an
    * LSH-confidence signal), both ids join back to the `store`
    * (doc_id, text — at scale a keyed document/vector store table;
    * the id frame is broadcast so the store side never shuffles and its
    * scan prunes on the join key), and exact shingle Jaccard ≥
    * `threshold` keeps a pair or kills the false-positive collision.
    *
    * Returns (first_id, new_id, n_bands, jaccard, verified):
    * `verified = true` rows passed exact Jaccard ≥ threshold;
    * `verified = false` rows (null jaccard) could NOT be checked because
    * one or both documents are missing from the store — typically a
    * same-micro-batch pair whose texts are upserted only after the batch
    * (candidates fire in Append mode exactly once, so silently dropping
    * these permanently lost the near-dup; callers must retry them after
    * their store upsert, or dead-letter them). Pairs whose Jaccard fell
    * below threshold are rejected as before — that is a verified
    * false-positive collision, not a lost pair.
    */
  def verifyBatch(cands: DataFrame, store: DataFrame, threshold: Double,
                  shingleN: Int = 3): DataFrame = {
    val pairs = cands
      .groupBy(col("first_id").as("d1"), col("new_id").as("d2"))
      .agg(count(lit(1)).as("n_bands"))
    // a micro-batch's candidate ids are few; broadcast them against the
    // (huge) store so pruning is a map-side hash probe
    val ids = pairs
      .select(explode(array(col("d1"), col("d2"))).as("doc_id"))
      .distinct()
    val texts = store.join(broadcast(ids), "doc_id")
    val present = texts.select(col("doc_id")).distinct()
    val checkable = pairs
      .join(broadcast(present.select(col("doc_id").as("d1"))), Seq("d1"), "left_semi")
      .join(broadcast(present.select(col("doc_id").as("d2"))), Seq("d2"), "left_semi")
    val unverifiable = pairs
      .join(checkable.select(col("d1"), col("d2")), Seq("d1", "d2"), "left_anti")
    val shingles = graft.operators.Dedup.wordShingles(texts, "doc_id", "text", shingleN)
    graft.operators.Dedup
      .verifyJaccard(checkable.select(col("d1"), col("d2")), shingles, threshold)
      .join(pairs, Seq("d1", "d2"))
      .select(col("d1").as("first_id"), col("d2").as("new_id"),
        col("n_bands"), col("jaccard"), lit(true).as("verified"))
      .unionByName(unverifiable.select(
        col("d1").as("first_id"), col("d2").as("new_id"), col("n_bands"),
        lit(null).cast("double").as("jaccard"), lit(false).as("verified")))
  }

  /** The worked end-to-end wiring: [[candidates]] → `foreachBatch` →
    * [[verifyBatch]] against a document store → `onBatch` receives each
    * micro-batch's near-dups: `verified = true` rows are CONFIRMED
    * (false-positive band collisions already rejected by exact Jaccard),
    * `verified = false` rows await their store upsert — re-verify or
    * dead-letter them. Call `.start()` on the returned
    * writer (add `checkpointLocation` for production restarts; `store`
    * is re-read per batch, so a Delta/parquet-backed store reflects
    * upserts between batches).
    */
  def verifiedNearDups(docs: Dataset[Doc], store: DataFrame, delay: String,
                       threshold: Double, k: Int = 8, bands: Int = 4,
                       shingleN: Int = 3)
                      (onBatch: (DataFrame, Long) => Unit): DataStreamWriter[Candidate] =
    candidates(docs, delay, k, bands, shingleN)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Candidate], batchId: Long) =>
        onBatch(verifyBatch(batch.toDF(), store, threshold, shingleN), batchId)
      }
}
