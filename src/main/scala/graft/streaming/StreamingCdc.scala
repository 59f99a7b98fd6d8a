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
  * transactional table): each micro-batch merges into a STAGING
  * directory, renames it into `v_<batchId>` (a metadata-only swap —
  * the merge's lazy read of the previous snapshot is NEVER overwritten
  * by its own write, which would otherwise delete the live data mid-job
  * on any plan that reads after the overwrite starts), and then flips
  * the one-line `_latest` pointer via its own write-temp-then-rename.
  * Readers resolve the pointer and VALIDATE it (target present with a
  * `_SUCCESS` commit marker); an invalid or mid-swap pointer falls back
  * to the newest committed version on disk — so every crash window
  * leaves readers a complete snapshot:
  *  - die during the staging write → orphan staging dir, old state
  *    intact; the replay deletes it and rewrites.
  *  - die between the `v_b` delete and the staging rename (a replay
  *    rewriting its own committed version) → the pointer names a
  *    missing dir, readers fall back to the retained previous version,
  *    and the replay's next attempt recomputes from that same fallback
  *    — which is exactly the snapshot the dead attempt read, because
  *    applying a batch is idempotent over its own result (spec-pinned).
  *  - die between the pointer delete and its rename → readers fall back
  *    to the newest committed version, which IS the one the pointer was
  *    about to name.
  * Together with the merge's replay idempotence this is exactly-once
  * table state over an at-least-once stream.
  *
  * At 100 TB the full-rewrite merge becomes a partition-wise rewrite
  * (bucket the snapshot on the key with [[graft.operators.Bucketing]]
  * and rewrite only buckets holding changed keys) or a real table
  * format's MERGE; the stream-side shape — latest-change cut, one
  * full-outer apply per batch — is unchanged.
  */
object StreamingCdc {

  private val VersionName = "^v_(\\d+)$".r

  private def committedVersions(fs: org.apache.hadoop.fs.FileSystem,
                                dir: Path): Seq[Long] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName).toSeq.collect {
      case VersionName(n) if fs.exists(new Path(dir, s"v_$n/_SUCCESS")) =>
        n.toLong
    }.sorted

  /** Read the current materialized snapshot (empty with `schema` before
    * the first batch commits). The `_latest` pointer is validated — its
    * target must exist with a `_SUCCESS` commit marker — and an
    * invalid/missing/mid-swap pointer falls back to the newest committed
    * version on disk, so readers survive every writer crash window. */
  def currentState(spark: SparkSession, statePath: String,
                   schema: StructType): DataFrame = {
    val dir = new Path(statePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ptr = new Path(dir, "_latest")
    val pointed: Option[String] =
      if (!fs.exists(ptr)) None
      else {
        val in = fs.open(ptr)
        val v = try scala.io.Source.fromInputStream(in).mkString.trim
        finally in.close()
        v match {
          case VersionName(_) if fs.exists(new Path(dir, s"$v/_SUCCESS")) =>
            Some(v)
          case _ => None
        }
      }
    pointed.orElse(committedVersions(fs, dir).lastOption.map(v => s"v_$v"))
      .map(v => spark.read.parquet(new Path(dir, v).toString))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
  }

  /** The per-batch body, exposed so a spec (or a backfill job) can run
    * and re-run it deterministically. Unlike
    * [[StreamingIncrementalDedup]] — whose state read must be pinned to
    * versions strictly older than the batch because re-admitting against
    * its own output would CHANGE the admissions — the CDC merge reads
    * the current snapshot (possibly its own committed `v_b` on a
    * post-commit replay) and that is safe because applying a batch is
    * IDEMPOTENT over its own result: every upsert rewrites its identical
    * winning row, every delete re-deletes an absent key (spec-pinned,
    * batches randomized). The staging-then-rename write discipline in
    * the class doc makes every crash window recoverable. */
  def processBatch(batch: DataFrame, batchId: Long, statePath: String,
                   keyCol: String, seqCols: Seq[String], opCol: String,
                   payloadCols: Seq[String], retainVersions: Int = 2,
                   flipPointer: Boolean = true): Unit = {
    require(retainVersions >= 2,
      "retainVersions < 2 would vacuum the snapshot a pre-flip reader holds")
    val spark = batch.sparkSession
    val stateSchema = StructType(batch.schema.fields
      .filter(f => f.name == keyCol || payloadCols.contains(f.name)))
    val snapshot = currentState(spark, statePath, stateSchema)
    val merged = CdcMerge.applyCdc(snapshot, batch, keyCol, seqCols,
      opCol, payloadCols)
    val dir = new Path(statePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val version = s"v_$batchId"
    val staging = new Path(dir, s"_staging_$version")
    // stage the merge: the job's lazy read of the previous snapshot —
    // which on a replay may be v_<batchId> ITSELF — must never race its
    // own overwrite (observed failure mode of in-place overwrite: the
    // write deletes the directory before the read plan scans it,
    // killing the job AND the live snapshot)
    fs.delete(staging, true)
    merged.write.mode("overwrite").parquet(staging.toString)
    fs.delete(new Path(dir, version), true)
    if (!fs.rename(staging, new Path(dir, version)))
      throw new java.io.IOException(s"rename $staging -> $version failed")
    if (flipPointer) {
      // pointer flip via write-temp-then-rename: a reader never observes
      // a truncated/partial pointer, and the missing-pointer instant
      // between delete and rename falls back (currentState) to the
      // newest committed version — which is the one being named
      val ptr = new Path(dir, "_latest")
      val ptrTmp = new Path(dir, "_latest.tmp")
      val out = fs.create(ptrTmp, true)
      try out.write(version.getBytes("UTF-8")) finally out.close()
      fs.delete(ptr, false)
      if (!fs.rename(ptrTmp, ptr))
        throw new java.io.IOException(s"pointer flip to $version failed")
      // vacuum superseded snapshots (keep the newest retainVersions) and
      // any orphan staging dirs from dead attempts of OTHER batches
      val names = fs.listStatus(dir).map(_.getPath.getName)
      names.collect { case VersionName(n) => n.toLong }
        .sorted.dropRight(retainVersions)
        .foreach(i => fs.delete(new Path(dir, s"v_$i"), true))
      names.filter(n => n.startsWith("_staging_") && n != s"_staging_$version")
        .foreach(n => fs.delete(new Path(dir, n), true))
    }
    ()
  }

  /** Start materializing `changes` (a streaming frame carrying `keyCol`,
    * `seqCols`, `opCol`, `payloadCols`) into `statePath`.
    *
    * `retainVersions` bounds storage: after each pointer flip, all but
    * the newest N snapshot versions vacuum. Without a bound, superseded
    * `v_*` directories accumulate forever — O(snapshot) dead bytes per
    * batch. N ≥ 2 (enforced here AND in [[processBatch]] — a backfill
    * caller passing 0 would vacuum every version including the one just
    * committed) keeps the previous snapshot as a grace window for
    * readers that resolved `_latest` just before the flip; replay
    * safety is [[processBatch]]'s idempotence argument, spec-pinned
    * through the crash windows. */
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
