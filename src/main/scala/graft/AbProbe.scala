package graft

import org.apache.spark.sql.SparkSession

/** A/B timing probe for disputed bench reads — the committed-artifact
  * successor of the round-11 `tools/IvfProbe.scala` ad-hoc harness (whose
  * numbers lived only in SURVEY prose and were unauditable afterwards).
  *
  * Replicates the bench's exact per-query protocol — 2 warm-ups then 3
  * timed runs with caches left hot, cache cleared between sessions — for
  * `sessions` sessions in one JVM, and APPENDS one JSON line per query to
  * the probe record (`SPARK_GRAFT_AB_OUT`, default `ab_probe.jsonl`), so
  * an A/B driver script can interleave runs of two checked-out trees
  * (tagged via `SPARK_GRAFT_AB_TREE`) and the resulting record carries
  * both sides plus a machine-health reading per JVM: the same
  * single-thread and 32-thread calibration probes the bench itself uses
  * to flag contention. A probe line whose calibration is far off the
  * idle reference (0.80 s / 0.22 s) is a machine-day artifact, not
  * evidence — exactly the distinction the r11 drift disputes needed.
  *
  * Usage: `sbt "runMain graft.AbProbe q1 q2 ..."` (default query set =
  * the queries the r11 drift list flagged). Not part of the library.
  */
object AbProbe {
  // self-contained copies of Bench's calibration probes (same constants,
  // same loop) so this ONE file can be dropped into any older tree for
  // an A/B session without dragging Bench's internals along
  private def mixRounds(seed: Long, rounds: Long): Long = {
    var h = 0x9e3779b97f4a7c15L ^ seed
    var i = 0L
    while (i < rounds) {
      h ^= i; h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
      i += 1
    }
    h
  }
  private def calSecs(): Double = {
    val t0 = System.nanoTime()
    if (mixRounds(0L, 400000000L) == 42L) System.out.print("")
    (System.nanoTime() - t0) / 1e9
  }
  private def calParSecs(): Double = {
    val t0 = System.nanoTime()
    val ts = (0 until 32).map { k =>
      val t = new Thread(() => {
        if (mixRounds(k.toLong, 100000000L) == 42L) System.out.print("")
      })
      t.start(); t
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tree = sys.env.getOrElse("SPARK_GRAFT_AB_TREE", "worktree")
    val out = sys.env.getOrElse("SPARK_GRAFT_AB_OUT", "ab_probe.jsonl")
    val sessions = sys.env.get("SPARK_GRAFT_AB_SESSIONS")
      .flatMap(_.toIntOption).getOrElse(5)
    // same session shape as the bench run whose reads are under dispute:
    // a probe at a fixed local[32] would amortize the scheduling/fixed
    // overhead (exactly the quantity the disputed reads are made of)
    // differently from a local[4] bench and could clear a real regression
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("sim_hybrid_rrf", "sim_hybrid_mmr", "d_fuzzy_pairs",
        "sim_ivfpq_res_topk", "sim_bm25_multi", "t_fertility")
    // validate up front: a mistyped name must fail BEFORE minutes of
    // timed sessions run, not after them
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
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
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    def append(line: String): Unit = {
      val w = new java.io.FileWriter(out, true)
      try w.write(line + "\n") finally w.close()
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val medians = (0 until sessions).map { _ =>
        fn(spark, sfDir).count(); fn(spark, sfDir).count() // bench warm-ups
        val ts = Seq.fill(3)(timed(fn(spark, sfDir).count())).sorted
        clear()
        ts(1)
      }
      val sortedM = medians.sorted
      val med = sortedM(sortedM.size / 2)
      // appended PER QUERY (a later query's failure must not discard the
      // minutes of sessions already measured). Each line carries a
      // CONTEMPORANEOUS single-thread probe taken right after its own
      // sessions (cheap — ~0.8 s next to minutes of timed work) plus the
      // JVM-start readings under bench-matching *_start_* names: a
      // reader of one line (the natural A/B comparison unit) must not
      // mistake a stale JVM-start reading for this query's machine
      // health — a load burst arriving mid-run shows in the per-query
      // probe, not only in the closing line below.
      val calQuery = calSecs()
      // schema_version marks the r13 key renames (calibration_single_sec →
      // calibration_start_sec etc., r13 ADVICE low): longitudinal joins
      // across ab_probe_r*.jsonl files key on it instead of guessing
      // which vintage a line is from. v2 = bench-matching *_start_* names
      // + per-query probe; v1 lines (r12 and earlier) carry no version.
      val line = s"""{"schema_version":2,"query":"$name","tree":"$tree","sf":"${
          new java.io.File(sfDir).getName
        }","median":$med,"session_medians":[${medians.mkString(",")}],""" +
        s""""calibration_query_sec":$calQuery,""" +
        s""""calibration_start_sec":$calStart,"calibration_par_start_sec":$calParStart}"""
      println(line)
      append(line)
    }
    spark.stop()
    // bracket the JVM like the bench does (probes sample instants; a
    // burst between them can still slip through, but a burst DURING the
    // sessions moves the end reading): one closing machine-health line
    val calEnd = calSecs()
    val calParEnd = calParSecs()
    val closing = s"""{"schema_version":2,"tree":"$tree","calibration_end_sec":$calEnd,""" +
      s""""calibration_par_end_sec":$calParEnd}"""
    println(closing)
    append(closing)
  }
}
