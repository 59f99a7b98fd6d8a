package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.Dedup

/** Corpus-LIFETIME streaming dedup — the live-ingest form of the batch
  * incremental operators ([[graft.operators.Dedup.buildExactIndex]] /
  * `dedupDeltaExact` / `mergeExactIndex`).
  *
  * [[StreamingDedup]] answers "is this a replay within the lateness
  * horizon?" — its state store expires hashes with the watermark, which
  * is the right contract for transport-level replays but the WRONG one
  * for corpus building, where a document ingested last month must still
  * block its copy today. This operator keeps the dedup state where
  * corpus-lifetime state belongs: a persistent (content_md5, kept_id)
  * parquet index on cheap storage, NOT the streaming state store — the
  * state store scales with distinct-hashes-per-horizon, the index with
  * the corpus itself (store it bucketed on the hash at scale so each
  * micro-batch's anti-join co-locates without shuffling the index).
  *
  * Per micro-batch (`foreachBatch`): admit = delta anti-join the index +
  * within-batch collapse (exactly [[Dedup.dedupDeltaExact]]), write the
  * admitted documents to `outPath/batch_<id>`, then write the merged
  * index as a NEW version `v_<id>`. Replay safety is by construction:
  * batch b always merges against the newest version STRICTLY OLDER than
  * b (never a `_latest` pointer, which a half-finished first attempt of
  * b itself may have advanced) — re-running b reads the identical
  * state-as-of-(b−1), recomputes the identical admissions, and
  * overwrites both outputs in place. Exactly-once admission over an
  * at-least-once stream, the [[StreamingCdc]] recipe with the
  * pointer-read rule hardened for self-replay.
  */
object StreamingIncrementalDedup {

  val IndexSchema: StructType = StructType(Seq(
    StructField("content_md5", StringType),
    StructField("kept_id", LongType)))

  /** Newest committed index version strictly older than `batchId`
    * (empty frame before the first commit). Listing versions instead of
    * reading a pointer is what makes a replayed batch read the same
    * state its first attempt did. */
  def indexBefore(spark: SparkSession, statePath: String,
                  batchId: Long): DataFrame = {
    val dir = new Path(statePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions =
      if (!fs.exists(dir)) Array.empty[Long]
      else fs.listStatus(dir).map(_.getPath.getName)
        .collect { case s if s.startsWith("v_") => s.drop(2).toLong }
        .filter(_ < batchId)
    if (versions.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], IndexSchema)
    else spark.read.parquet(new Path(dir, s"v_${versions.max}").toString)
  }

  /** The per-batch body, exposed so a spec (or a backfill job) can run
    * and re-run it deterministically: admit against the pre-`batchId`
    * index, write admitted docs, commit the merged index as `v_<id>`. */
  def processBatch(batch: DataFrame, batchId: Long,
                   statePath: String, outPath: String): Unit = {
    val spark = batch.sparkSession
    val index = indexBefore(spark, statePath, batchId)
    // the batch feeds the anti-join AND the admitted-doc join back;
    // micro-batches re-read their source on each action otherwise
    val pinned = batch.select(col("doc_id"), col("text")).localCheckpoint()
    val survivors = Dedup.dedupDeltaExact(pinned, index, "doc_id", "text")
      .localCheckpoint() // feeds two writes; compute the anti-join once
    val admitted = pinned.join(
      broadcast(survivors.select(col("kept_id").as("doc_id"), col("n_copies"))),
      "doc_id")
    admitted.write.mode("overwrite")
      .parquet(new Path(outPath, s"batch_$batchId").toString)
    Dedup.mergeExactIndex(index, survivors).write.mode("overwrite")
      .parquet(new Path(statePath, s"v_$batchId").toString)
  }

  /** Start corpus-lifetime dedup of a streaming (doc_id, text) frame. */
  def ingest(docs: DataFrame, statePath: String, outPath: String,
             checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, statePath, outPath)
      }
      .start()

  /** All admitted documents so far (the deduplicated corpus). */
  def admittedCorpus(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(new Path(outPath, "batch_*").toString)
}
