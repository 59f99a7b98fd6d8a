package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamArchiver

/** Archival sink: rotation layout + exactly-once across restart. */
class StreamArchiverSpec extends SparkTestBase {

  test("archive rotates by date/hour and a checkpoint restart never duplicates") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val outDir = Files.createTempDirectory("archive_out").toString
    val ckptDir = Files.createTempDirectory("archive_ckpt").toString
    def t(s: String) = Timestamp.valueOf(s)

    val input = MemoryStream[(Timestamp, Long)]
    val df = input.toDF().toDF("ts", "event_id")

    val q1 = StreamArchiver.archive(df, "ts", outDir, ckptDir)
    input.addData((t("2024-01-01 10:15:00"), 1L), (t("2024-01-01 11:40:00"), 2L))
    q1.processAllAvailable()
    q1.stop()

    // rotation layout: one partition dir per (date, hour)
    val part1 = new java.io.File(s"$outDir/archive_date=2024-01-01/archive_hour=10")
    val part2 = new java.io.File(s"$outDir/archive_date=2024-01-01/archive_hour=11")
    assert(part1.isDirectory && part2.isDirectory)
    // transactional commit log = the COMPLETE marker
    assert(new java.io.File(s"$outDir/_spark_metadata").exists())
    assert(spark.read.parquet(outDir).count() == 2)

    // restart from the same checkpoint: old batch must not re-emit
    val input2 = MemoryStream[(Timestamp, Long)]
    input2.addData((t("2024-01-01 10:15:00"), 1L), (t("2024-01-01 11:40:00"), 2L)) // replayed upstream
    input2.addData((t("2024-01-02 09:00:00"), 3L)) // genuinely new
    val q2 = StreamArchiver.archive(input2.toDF().toDF("ts", "event_id"), "ts", outDir, ckptDir)
    q2.processAllAvailable()
    q2.stop()

    val all = spark.read.parquet(outDir).select($"event_id").collect().map(_.getLong(0)).sorted
    assert(all.toSeq == Seq(1L, 2L, 3L),
      s"expected exactly-once across restart, got ${all.toSeq}")
  }
}
