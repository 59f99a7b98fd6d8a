package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Rotating archival sink (reference: tools/compressed_stream_rotator.py —
  * stdin → gzip files rotated per period with COMPLETE markers).
  *
  * In Spark the whole tool collapses to a partitioned streaming file sink:
  * time-based rotation = `partitionBy` on a derived period column, the
  * COMPLETE marker = the sink's transactional `_spark_metadata` commit log,
  * compression = the writer codec, and crash recovery = the checkpoint —
  * a restart resumes from the last committed offset with no duplicated or
  * torn files, which is the exactly-once guarantee the reference
  * hand-builds (SURVEY §2.7 ST1).
  *
  * Operational contract — the three ways to defeat the sink's guarantee,
  * documented because none of them raises an error:
  *  - `_spark_metadata` scopes the exactly-once view to Spark readers of
  *    the SINK ROOT. A failed attempt's orphan part-files can remain in a
  *    partition directory; a consumer that lists partition directories
  *    (or Spark-reads a partition path directly) sees them. External
  *    consumers must resolve committed files through the sink root.
  *  - outDir and checkpointDir pair FOR LIFE: re-pointing a fresh
  *    checkpoint at an existing outDir restarts batchIds at 0 and
  *    FileStreamSink silently SKIPS every batch whose id is ≤ the largest
  *    id in the existing `_spark_metadata` log — data loss with no error.
  *    A new checkpoint needs a new outDir.
  *  - the sink assumes a single live writer (Structured Streaming does
  *    not fence zombie drivers); run one archiver per (outDir,
  *    checkpoint) pair.
  *
  * Rotation partitions derive from the event-time INSTANT via epoch
  * arithmetic, not `date_format` — which renders in the session
  * timezone, so a restart under a different timezone config would
  * re-route the same events to different partitions and split a day's
  * archive across directories. Partitions are UTC by construction.
  */
object StreamArchiver {

  /** Archive a streaming frame to parquet, rotated by UTC day and hour of
    * the event-time column. */
  def archive(
      df: DataFrame,
      tsCol: String,
      outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("1 minute"),
      codec: String = "snappy"): StreamingQuery = {
    // seconds since epoch — timezone-independent; day/hour follow by
    // INTEGER floor arithmetic (UTC has no DST, every day is 86400 s).
    // pmod + subtract-then-div, not `/` and `%`: Spark's `/` returns
    // DOUBLE, so hour 9 rendered "9.0", lpad truncated it to "9." and
    // every single-digit hour landed in a garbage partition readers
    // never match; and `%` keeps the dividend's sign, so pre-1970
    // events got hour "-1" on the wrong date. pmod is non-negative and
    // (epoch - pmod) div 86400 is exact floorDiv — both empirically
    // pinned in StreamArchiverSpec.
    val epoch = col(tsCol).cast("long")
    val secOfDay = pmod(epoch, lit(86400L))
    val epochDay = ((epoch - secOfDay) / 86400L).cast("int")
    df
      .withColumn("archive_date",
        date_format(date_add(lit(java.sql.Date.valueOf("1970-01-01")),
          epochDay), "yyyy-MM-dd"))
      .withColumn("archive_hour",
        lpad((secOfDay / 3600L).cast("int").cast("string"), 2, "0"))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .option("compression", codec)
      .partitionBy("archive_date", "archive_hour")
      .trigger(trigger)
      .outputMode("append")
      .start()
  }
}
