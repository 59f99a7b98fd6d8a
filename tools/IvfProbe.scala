// Focused timing probe for the sim_ivf_topk regression hunt (round 11).
// Replicates the bench's exact per-query protocol: 2 warm-ups then 3
// timed runs with caches left hot, repeated for `reps` sessions in one
// JVM. Not part of the library.
package graft

import org.apache.spark.sql.SparkSession

object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    val names = if (args.nonEmpty) args.toSeq else Seq("sim_ivf_topk")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val medians = (0 until 5).map { _ =>
        fn(spark, sfDir).count(); fn(spark, sfDir).count() // bench warm-ups
        val ts = Seq.fill(3)(timed(fn(spark, sfDir).count())).sorted
        clear()
        ts(1)
      }
      println(s"$name bench-protocol medians: " +
        medians.map(t => f"$t%.3f").mkString(","))
    }
    spark.stop()
  }
}
