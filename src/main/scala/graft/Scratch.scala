package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val aqe = sys.env.getOrElse("SCRATCH_AQE", "true")
    val parts = sys.env.getOrElse("SCRATCH_PARTS", "32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.adaptive.coalescePartitions.enabled", sys.env.getOrElse("SCRATCH_COALESCE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[scratch] aqe=$aqe parts=$parts")

    def timed(name: String)(fn: => Unit): Unit = {
      fn // warm
      val t0 = System.nanoTime()
      fn
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    // floor: single count, one groupBy, two chained groupBys
    val docs = Tables.documents(spark, dir).cache()
    docs.count()
    timed("floor-count") { docs.count() }
    timed("floor-1-shuffle") { docs.groupBy("lang").count().count() }
    timed("floor-2-shuffle") {
      docs.groupBy("lang", "doc_id").count().groupBy("lang").count().count()
    }
    timed("floor-3-shuffle") {
      docs.groupBy("lang", "doc_id").count()
        .groupBy("lang").count().withColumnRenamed("count", "c")
        .groupBy("c").count().count()
    }
    for (q <- Seq("d_ngram_near_dups", "d_minhash_lsh", "d_simhash",
                  "d_embedding_cosine")) {
      timed(q) { SparkEntry.queries(q)(spark, dir).count() }
    }

    // contamination dissection
    import graft.operators.{Curation, Dedup}
    val dd = Tables.documents(spark, dir)
    val train = dd.filter(col("doc_id") % 11 =!= 0)
    val bench = dd.filter(col("doc_id") % 11 === 0)
    timed("contam-train-grams") {
      Dedup.wordShingles(train, "doc_id", "text", 5).count()
    }
    timed("contam-bench-grams") {
      Dedup.wordShingles(bench, "doc_id", "text", 5).count()
    }
    timed("contam-full") {
      Curation.ngramContamination(train, bench, "doc_id", "text", 5, 0.5).count()
    }
    spark.stop()
  }
}
