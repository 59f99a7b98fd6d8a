package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1.0-class soak (r12 verdict #7): time the top-5 most expensive
  * operators on a corpus ~10× the bench sf0.1 fixture, extending each
  * op's three-point scale-slope fit (sf0.001/0.01/0.1, published in
  * BENCH_r13) with a measured FOURTH point — the 100×-scale story for
  * the ops that matter becomes measured evidence, not extrapolation.
  *
  * The scaled corpus is derived from sf0.1 (never written under
  * /root/testdata): replica k of a document re-keys `doc_id` by a
  * 10M stride and applies a deterministic word permutation keyed on
  * (word, position, k) — crucially NOT on doc_id — so that
  *  - two near-duplicate originals permute ALIKE within a replica
  *    (their shared (word, position) pairs sort identically), keeping
  *    each replica's near-dup DENSITY ≈ the original fixture's, while
  *  - the same original across two replicas permutes DIFFERENTLY
  *    (k differs), so no phantom cross-replica duplicates inflate the
  *    LSH/clustering output superlinearly the way verbatim replication
  *    would (10 verbatim copies = a 10-clique per doc = 45× the pairs).
  * Replica embeddings are fresh deterministic pseudo-random vectors in
  * [-1,1]^dim (the fixture itself is near-isotropic random), re-keyed
  * by the same stride; probes stay the fixture's 5 (`vec_id < 5` only
  * matches replica 0), matching the bench query shape.
  *
  * Protocol per op and per scale: 2 warm-ups + 3 timed runs, median +
  * spread, caches cleared between — bench-identical. sf0.1 is re-timed
  * in the SAME JVM so the published 4th-point exponent
  * log(t_soak/t_sf0.1)/log(factor) never mixes two machine-days.
  * Calibration probes bracket the run exactly like the bench.
  *
  * Not part of the library; not wired to the driver gate. Output: one
  * JSON line, also written to `bench_soak_r<N>_x<factor>.json`.
  */
object Soak {
  // the verdict's top-5 most expensive ops, plus two adjudicators the
  // first soak pass motivated: d_ngram_capped rides beside
  // d_ngram_near_dups because the EXHAUSTIVE trigram-Jaccard op is
  // definitionally quadratic in shingle doc-frequency (its 4th-point
  // exponent measured 1.15 — pairs per shared shingle grow as df²; no
  // formulation fixes that, the OUTPUT is quadratic) and the capped
  // variant is the designated 100 TB path whose flatness this measures;
  // d_fuzzy_pairs because PassJoin's segment-key blocking is the other
  // pair-emitting op whose scale behavior two-point fits kept disputing
  private val soakOps = Seq("d_dup_clusters", "d_minhash_lsh",
    "sim_ivfpq_res_topk", "d_ngram_near_dups", "d_ngram_capped",
    "d_fuzzy_pairs", "d_incr_lsh")

  private val DocStride = 10000000L
  private val VecStride = 10000000L

  // bench-identical machine-health probes — shared via [[Calibration]]
  private def calSecs(): Double = Calibration.calibrationSecs()
  private def calParSecs(): Double = Calibration.calibrationParallelSecs()

  /** Build the scaled corpus under `soakDir` if absent (idempotent —
    * a pre-built dir at the same factor AND source fixture is reused
    * across sessions; the marker records both, and a mismatch on either
    * rebuilds — reusing an sf0.1-derived corpus against an sf0.01
    * tBase would publish an exponent over a mislabeled scale gap). */
  private def buildCorpus(spark: SparkSession, srcDir: String,
                          soakDir: String, factor: Int): Unit = {
    val marker = new java.io.File(soakDir, s"_SOAK_x$factor")
    val provenance = s"factor=$factor src=$srcDir"
    if (marker.isFile) {
      val src = scala.io.Source.fromFile(marker)
      val content = try src.mkString.trim finally src.close()
      if (content == provenance) return
    }
    val dir = new java.io.File(soakDir)
    if (dir.exists()) { // a stale/partial build or different factor/src: rebuild
      // destructive-delete guard: a soak dir is recognizable by its
      // _SOAK_x* marker (any factor). A non-empty dir WITHOUT one is
      // whatever a typo'd SPARK_GRAFT_SOAK_DIR pointed at — refuse to
      // recursively delete it.
      val entries = Option(dir.listFiles()).getOrElse(Array.empty)
      require(entries.isEmpty || entries.exists(_.getName.startsWith("_SOAK_x")),
        s"refusing to clear $soakDir: non-empty and not a soak corpus " +
          "(no _SOAK_x* marker) — check SPARK_GRAFT_SOAK_DIR")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(dir)
    }
    dir.mkdirs()
    // provisional marker BEFORE the parquet writes (r13 ADVICE low): a
    // build that crashes mid-write otherwise leaves a non-empty dir with
    // NO _SOAK_x* marker, and the destructive-delete guard above then
    // refuses to clear it forever — the crashed build locks out its own
    // rebuild. The provisional content never equals the final provenance,
    // so a restart recognizes the dir as a (partial) soak corpus, clears
    // it, and rebuilds; the real marker overwrites this one only after
    // both tables land.
    locally {
      val w = new java.io.PrintWriter(marker)
      try w.println(s"BUILDING $provenance") finally w.close()
    }

    val docs = Tables.documents(spark, srcDir)
    // one row per (original doc, replica k); replica 0 is verbatim.
    // The permutation sorts the doc's (word, original position) pairs
    // by xxhash64(word, position, k): deterministic, position-aligned
    // across near-dup originals, decorrelated across replicas.
    val repDocs = docs
      .withColumn("k", explode(lit((0 until factor).toArray)))
      .withColumn("doc_id", col("doc_id") + col("k") * lit(DocStride))
      .withColumn("text",
        when(col("k") === 0, col("text")).otherwise(
          array_join(
            transform(
              array_sort(
                zip_with(
                  filter(split(col("text"), "\\s+"), w => w =!= ""),
                  sequence(lit(1),
                    size(filter(split(col("text"), "\\s+"), w => w =!= ""))),
                  (w, i) => struct(xxhash64(w, i, col("k")).as("h"),
                    w.as("w")))),
              s => s.getField("w")),
            " ")))
      .withColumn("n_chars", length(col("text")))
      .drop("k")
    repDocs.repartition(32).write.mode("overwrite")
      .parquet(new java.io.File(soakDir, "documents.parquet").getPath)

    val vecs = Tables.embeddings(spark, srcDir)
    val dim = vecs.select(size(col("embedding"))).head().getInt(0)
    val repVecs = vecs
      .withColumn("k", explode(lit((0 until factor).toArray)))
      .withColumn("vec_id", col("vec_id") + col("k") * lit(VecStride))
      .withColumn("embedding",
        when(col("k") === 0, col("embedding")).otherwise(
          transform(sequence(lit(0), lit(dim - 1)),
            i => ((pmod(xxhash64(col("vec_id"), i), lit(2000001L)) -
              lit(1000000L)) / lit(1000000.0)).cast("float"))))
      .drop("k")
    repVecs.repartition(32).write.mode("overwrite")
      .parquet(new java.io.File(soakDir, "embeddings.parquet").getPath)

    val w = new java.io.PrintWriter(marker)
    try w.println(provenance) finally w.close()
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val soakDir = sys.env.getOrElse("SPARK_GRAFT_SOAK_DIR", "/tmp/graft_soak")
    val factor = sys.env.get("SPARK_GRAFT_SOAK_FACTOR")
      .flatMap(_.toIntOption).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outName = sys.env.getOrElse("SPARK_GRAFT_SOAK_OUT",
      s"bench_soak_x$factor.json")
    // subset override for higher-factor runs (e.g. x30 of the flat
    // scale paths only — re-soaking the ops already adjudicated as
    // output-quadratic just burns the hour)
    val ops = sys.env.get("SPARK_GRAFT_SOAK_OPS")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(soakOps)
    locally {
      val unknown = ops.filterNot(SparkEntry.queries.contains)
      require(unknown.isEmpty, s"unknown soak ops: ${unknown.mkString(", ")}")
    }
    calSecs() // JIT warm-up for the probe loop
    val calStart = calSecs()
    val calParStart = calParSecs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    buildCorpus(spark, srcDir, soakDir, factor)
    val nDocs = spark.read.parquet(
      new java.io.File(soakDir, "documents.parquet").getPath).count()
    val nVecs = spark.read.parquet(
      new java.io.File(soakDir, "embeddings.parquet").getPath).count()
    println(s"[soak] corpus ready: $nDocs docs, $nVecs vecs (x$factor)")

    // ingest-persist (bare-scan) soak mode (r16 verdict #1): materialize
    // the validated embeddings table at BOTH scales so the published
    // exponent compares like against like — the 100 TB deployment shape,
    // where validation runs once at ingest and every query pays a bare
    // scan. Requires a WRITABLE srcDir (a fixture copy under /tmp, never
    // /root/testdata — persist writes into the corpus dir).
    val persistValid =
      sys.env.get("SPARK_GRAFT_SOAK_PERSIST_VALID").contains("1")
    if (persistValid) {
      // same refusal as PersistValid.main (r17 review): pointed at the
      // read-only shared fixture this would fail mid-soak, and pointed
      // at a shared writable base it would silently mutate the fixture
      // for every later run — a code comment is not a guard
      require(!srcDir.startsWith("/root/testdata"),
        "refusing to persist embeddings_valid.parquet into /root/testdata - " +
          "run the persist-valid soak on a fixture copy " +
          "(SPARK_GRAFT_SF_DIR=<writable copy>)")
      Tables.persistValidEmbeddings(spark, srcDir)
      Tables.persistValidEmbeddings(spark, soakDir)
      println("[soak] embeddings_valid.parquet persisted at both scales")
    }

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    // bench-identical: 2 warm-ups, N timed (default 3; the r13 verdict's
    // noisy-exponent re-runs use SPARK_GRAFT_SOAK_RUNS=5..7), median +
    // spread, spread-bounded retries matching the bench's tight-first
    // policy (any attempt wider than 20% re-measures, bounded at 3
    // attempts; among tight attempts the LOWEST median wins — noise only
    // drags times up). Output rows ride along: a super-linear TIME
    // exponent is only meaningful next to the OUTPUT exponent — a
    // pair-emitting op whose result set itself grows ~quadratically
    // (saturating blocking keys) can show time 14× at rows 97× and still
    // be getting CHEAPER per output row.
    val timedRuns = sys.env.get("SPARK_GRAFT_SOAK_RUNS")
      .flatMap(_.toIntOption).filter(_ >= 3).getOrElse(3)
    def measure(fn: (SparkSession, String) => DataFrame, dir: String)
        : (Double, Double, Long) = {
      fn(spark, dir).count()
      val rows = fn(spark, dir).count()
      def attempt(): Seq[Double] =
        Seq.fill(timedRuns)(timed(fn(spark, dir).count())).sorted
      def spreadOf(ts: Seq[Double]): Double = {
        val med = ts(ts.size / 2)
        if (med > 0) 100.0 * (ts.last - ts.head) / med else -1.0
      }
      var attempts = List(attempt())
      while (spreadOf(attempts.head) > 20.0 && attempts.size < 3)
        attempts = attempt() :: attempts
      val tight = attempts.filter(a => {
        val sp = spreadOf(a); sp >= 0 && sp <= 20.0
      })
      val pool = if (tight.nonEmpty) tight else attempts
      val times = pool.minBy(a => a(a.size / 2))
      clear()
      val med = times(times.size / 2)
      (med, spreadOf(times), rows)
    }

    case class SoakRow(name: String, tBase: Double, spBase: Double,
      rowsBase: Long, tSoak: Double, spSoak: Double, rowsSoak: Long,
      e: Double, eRows: Double)
    val rows: Seq[SoakRow] =
      ops.flatMap { name =>
        SparkEntry.queries.get(name).flatMap { fn =>
          // sf0.1 FIRST in the same JVM (the exponent's denominator must
          // share this session's warm-up depth and machine-hour), then
          // the scaled corpus; one op throwing must not discard the
          // measured rows before it
          try {
            val (tBase, spBase, rBase) = measure(fn, srcDir)
            val (tSoak, spSoak, rSoak) = measure(fn, soakDir)
            val e = if (tBase > 0 && tSoak > 0)
              math.log(tSoak / tBase) / math.log(factor.toDouble) else -1.0
            val eRows = if (rBase > 0 && rSoak > 0)
              math.log(rSoak.toDouble / rBase) / math.log(factor.toDouble) else -1.0
            println(f"[soak] $name%-20s sf0.1 $tBase%.3f s/$rBase rows  x$factor $tSoak%.3f s/$rSoak rows  exp $e%.3f rows-exp $eRows%.3f")
            Some(SoakRow(name, tBase, spBase, rBase, tSoak, spSoak, rSoak, e, eRows))
          } catch { case e: Throwable =>
            System.err.println(s"[soak] $name failed: $e"); clear(); None
          }
        }
      }
    spark.stop()
    val calEnd = calSecs()
    val calParEnd = calParSecs()
    def m(sel: SoakRow => Double, fmt: String): String =
      rows.map(r => "\"" + r.name + "\":" + fmt.format(sel(r)))
        .mkString("{", ",", "}")
    val json =
      s"""{"metric":"soak","factor":$factor,"docs":$nDocs,"vecs":$nVecs,""" +
        s""""queries_base_sec":${m(_.tBase, "%.4f")},""" +
        s""""base_spread_pct":${m(_.spBase, "%.1f")},""" +
        s""""queries_soak_sec":${m(_.tSoak, "%.4f")},""" +
        s""""soak_spread_pct":${m(_.spSoak, "%.1f")},""" +
        s""""rows_base":${m(_.rowsBase.toDouble, "%.0f")},""" +
        s""""rows_soak":${m(_.rowsSoak.toDouble, "%.0f")},""" +
        s""""exponent_base_to_soak":${m(_.e, "%.3f")},""" +
        s""""rows_exponent_base_to_soak":${m(_.eRows, "%.3f")},""" +
        f""""calibration_start_sec":$calStart%.3f,"calibration_end_sec":$calEnd%.3f,""" +
        f""""calibration_par_start_sec":$calParStart%.3f,"calibration_par_end_sec":$calParEnd%.3f,""" +
        s""""persist_valid":$persistValid,""" +
        s""""base_sf":"$srcDir","soak_dir":"$soakDir"}"""
    println(json)
    try {
      val w = new java.io.PrintWriter(outName)
      try w.println(json) finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[soak] failed to write $outName: $e")
    }
  }
}
