package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.refresh.CdcMerge

/** Continuous table materialization from a CDC stream — the streaming
  * form of [[graft.refresh.CdcMerge]]: what the reference's consumers do
  * with update/delete messages to keep a queryable copy of an upstream
  * table (`data_pipeline/consumer.py` delivers per-key upserts/deletes;
  * the refresh flow seeds the snapshot), expressed as `foreachBatch`
  * over Structured Streaming.
  *
  * State layout is versioned-snapshot-plus-pointer (the minimal
  * transactional table): each micro-batch merges into a NEW directory
  * `v_<batchId>` and then flips the one-line `_latest` pointer, so
  * readers always see a complete snapshot (never a half-written one)
  * and a crash between write and flip just leaves an orphan version.
  * Replays are safe end to end: re-running batch b rewrites `v_b` from
  * the same inputs deterministically, and the merge itself is
  * idempotent under batch replay (spec-pinned on the batch operator) —
  * together that is exactly-once table state over an at-least-once
  * stream, the same recipe as `StreamArchiver`'s rotate-then-commit.
  *
  * At 100 TB the full-rewrite merge becomes a partition-wise rewrite
  * (bucket the snapshot on the key with [[graft.operators.Bucketing]]
  * and rewrite only buckets holding changed keys) or a real table
  * format's MERGE; the stream-side shape — latest-change cut, one
  * full-outer apply per batch — is unchanged.
  */
object StreamingCdc {

  /** Read the current materialized snapshot (empty with `schema` before
    * the first batch commits). */
  def currentState(spark: SparkSession, statePath: String,
                   schema: StructType): DataFrame = {
    val dir = new Path(statePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ptr = new Path(dir, "_latest")
    if (!fs.exists(ptr))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else {
      val in = fs.open(ptr)
      val v = try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
      spark.read.parquet(new Path(dir, v).toString)
    }
  }

  /** The per-batch body, exposed so a spec (or a backfill job) can run
    * and re-run it deterministically. Unlike
    * [[StreamingIncrementalDedup]] — whose state read must be pinned to
    * versions strictly older than the batch because re-admitting against
    * its own output would CHANGE the admissions — the CDC merge reads
    * whatever `_latest` points to, and that is safe through BOTH crash
    * windows because applying a batch is IDEMPOTENT over its own result:
    *  - crash after `v_b` lands but before the pointer flips: the replay
    *    reads the old snapshot, recomputes the identical merge, and
    *    overwrites `v_b` in place;
    *  - crash after the flip (the nasty window — `_latest` already names
    *    the dead attempt's `v_b`): the replay re-applies batch b ON TOP
    *    of a snapshot that already contains it — every upsert rewrites
    *    its identical winning row (the batch side beats the snapshot
    *    side unconditionally, and the within-batch seq winner is the
    *    same), every delete re-deletes an absent key — landing on the
    *    byte-identical snapshot. Spec-pinned (StreamingSpec crash-window
    *    test). */
  def processBatch(batch: DataFrame, batchId: Long, statePath: String,
                   keyCol: String, seqCols: Seq[String], opCol: String,
                   payloadCols: Seq[String], retainVersions: Int = 2,
                   flipPointer: Boolean = true): Unit = {
    val spark = batch.sparkSession
    val stateSchema = StructType(batch.schema.fields
      .filter(f => f.name == keyCol || payloadCols.contains(f.name)))
    val snapshot = currentState(spark, statePath, stateSchema)
    val merged = CdcMerge.applyCdc(snapshot, batch, keyCol, seqCols,
      opCol, payloadCols)
    val dir = new Path(statePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val version = s"v_$batchId"
    merged.write.mode("overwrite").parquet(new Path(dir, version).toString)
    if (flipPointer) {
      // flip the pointer only after the full snapshot is on disk
      val out = fs.create(new Path(dir, "_latest"), true)
      try out.write(version.getBytes("UTF-8")) finally out.close()
      // vacuum superseded snapshots (keep the newest retainVersions)
      fs.listStatus(dir).map(_.getPath.getName)
        .collect { case s if s.startsWith("v_") => s.drop(2).toLong }
        .sorted.dropRight(retainVersions)
        .foreach(i => fs.delete(new Path(dir, s"v_$i"), true))
    }
    ()
  }

  /** Start materializing `changes` (a streaming frame carrying `keyCol`,
    * `seqCols`, `opCol`, `payloadCols`) into `statePath`.
    *
    * `retainVersions` bounds storage: after each pointer flip, all but
    * the newest N snapshot versions vacuum. Without a bound, superseded
    * `v_*` directories accumulate forever — O(snapshot) dead bytes per
    * batch. N ≥ 2 (enforced) keeps the previous snapshot as a grace
    * window for readers that resolved `_latest` just before the flip;
    * replay safety is [[processBatch]]'s idempotence argument,
    * spec-pinned through both crash windows. */
  def materialize(changes: DataFrame, statePath: String, checkpoint: String,
                  keyCol: String, seqCols: Seq[String], opCol: String,
                  payloadCols: Seq[String],
                  retainVersions: Int = 2): StreamingQuery = {
    require(retainVersions >= 2,
      "retainVersions < 2 would vacuum the snapshot a pre-flip reader holds")
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, statePath, keyCol, seqCols, opCol,
          payloadCols, retainVersions)
      }
      .start()
  }
}
