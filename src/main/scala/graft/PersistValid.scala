package graft

import org.apache.spark.sql.SparkSession

/** Driver for the ingest-persist path: materialize the validated
  * embeddings table into one or more (writable) corpus dirs —
  * `runMain graft.PersistValid <dir> [<dir> ...]`. This is the one-off
  * at-ingest job a cluster deployment runs so every later query pays a
  * bare scan (see [[Tables.persistValidEmbeddings]]); here it drives
  * the raw-vs-persisted verify/bench evidence pairs on fixture COPIES
  * (never /root/testdata, which is read-only).
  */
object PersistValid {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.PersistValid <corpusDir> [...]")
    require(!args.exists(_.startsWith("/root/testdata")),
      "refusing to write into /root/testdata - persist into a copy")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val out = Tables.persistValidEmbeddings(spark, dir)
      println(s"[persist-valid] wrote $out")
    }
    spark.stop()
  }
}
