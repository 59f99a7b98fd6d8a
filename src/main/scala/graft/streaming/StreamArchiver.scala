package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Rotating archival sink (reference: tools/compressed_stream_rotator.py —
  * stdin → gzip files rotated per period with COMPLETE markers).
  *
  * In Spark the whole tool collapses to a partitioned streaming file sink:
  * time-based rotation = `partitionBy` on a derived period column, the
  * COMPLETE marker = the sink's transactional `_spark_metadata` commit log
  * (readers see only committed files), compression = the writer codec, and
  * crash recovery = the checkpoint — a restart resumes from the last
  * committed offset with no duplicated or torn files, which is the
  * exactly-once guarantee the reference hand-builds (SURVEY §2.7 ST1).
  */
object StreamArchiver {

  /** Archive a streaming frame to parquet, rotated by day and hour of the
    * event-time column. */
  def archive(
      df: DataFrame,
      tsCol: String,
      outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("100 milliseconds"),
      codec: String = "snappy"): StreamingQuery = {
    df
      .withColumn("archive_date", date_format(col(tsCol), "yyyy-MM-dd"))
      .withColumn("archive_hour", date_format(col(tsCol), "HH"))
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
