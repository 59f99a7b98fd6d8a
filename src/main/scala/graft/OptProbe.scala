package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level timing probe for the optimization rounds: decomposes the
  * most expensive bench queries into their pipeline stages and times each
  * with the noop sink (guide §1.4 — forces every column of every row,
  * never a count's pruned subtree), median of 3 after one warm-up.
  *
  * Usage: `runMain graft.OptProbe [sfDir] [probe ...]` — probes default to
  * all. Output: one `[opt] probe stage median_sec (runs...)` line per
  * stage. Measurement only; never part of the bench contract.
  */
object OptProbe {

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def timed(fn: () => Unit): Double = {
    val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
  }

  /** Counts jobs/stages/tasks launched during one timed run — the
    * fixed-overhead diagnostic: at fixture scale a query's wall time is
    * dominated by its job count times the local-mode scheduling floor. */
  private final class JobCounter extends org.apache.spark.scheduler.SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
    }
  }

  private def stage(spark: SparkSession, probe: String, name: String)
                   (mk: () => DataFrame): Unit = {
    spark.sparkContext.setJobDescription(s"$probe: $name")
    try {
      noop(mk()) // warm-up
      val counter = new JobCounter
      spark.sparkContext.addSparkListener(counter)
      val ts = Seq.fill(3)(timed(() => noop(mk()))).sorted
      Thread.sleep(300) // let the async listener bus drain
      spark.sparkContext.removeSparkListener(counter)
      val (j, st, tk) = (counter.jobs.get / 3, counter.stages.get / 3, counter.tasks.get / 3)
      println(f"[opt] $probe%-16s $name%-28s ${ts(1)}%7.3f s  (${ts.map(t => f"$t%.3f").mkString(", ")})  ~$j jobs/$st stages/$tk tasks per run")
    } catch { case e: Throwable =>
      println(s"[opt] $probe $name FAILED: $e")
    } finally {
      spark.sparkContext.setJobDescription(null)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val wanted = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def want(p: String): Boolean = wanted.isEmpty || wanted.contains(p)

    // ---- env_dead_letter decomposition ----
    if (want("env_dead_letter")) {
      val p = "env_dead_letter"
      stage(spark, p, "full_query")(() =>
        SparkEntry.queries("env_dead_letter")(spark, dir))
      stage(spark, p, "scan_valid_events")(() =>
        Tables.events(spark, dir).filter(
          $"event_id".isNotNull && $"user_id".isNotNull &&
            $"event_type".isNotNull && $"value".isNotNull && $"ts".isNotNull))
      // pack only (clean envelope, no planted corruption)
      stage(spark, p, "pack_only")(() => {
        val reg = new graft.schema.SchemaRegistry
        val v1 = reg.registerSchema("demo", "event",
          queries.EnvelopeOps.eventSchemaJson).schemaId
        val env = struct(
          unhex(md5($"event_id".cast("string"))).as("uuid"),
          lit("create").as("message_type"),
          lit(v1).as("schema_id"),
          graft.functions.encode_payload(
            struct($"event_id", $"user_id", $"event_type", $"value"),
            queries.EnvelopeOps.eventSchemaJson).as("payload"),
          lit(null).cast("binary").as("previous_payload"),
          lit(null).cast(graft.core.Envelope.sparkType("meta").dataType).as("meta"),
          lit(null).cast("string").as("encryption_type"),
          graft.core.Envelope.timestampInt(unix_timestamp($"ts")).as("timestamp"))
        Tables.events(spark, dir).filter(
          $"event_id".isNotNull && $"user_id".isNotNull &&
            $"event_type".isNotNull && $"value".isNotNull && $"ts".isNotNull)
          .select(graft.functions.pack_envelope(env).as("value"))
      })
      // pack + unpack + decode, one branch, clean rows
      stage(spark, p, "pack_unpack_decode")(() => {
        val reg = new graft.schema.SchemaRegistry
        val v1 = reg.registerSchema("demo", "event",
          queries.EnvelopeOps.eventSchemaJson).schemaId
        val env = struct(
          unhex(md5($"event_id".cast("string"))).as("uuid"),
          lit("create").as("message_type"),
          lit(v1).as("schema_id"),
          graft.functions.encode_payload(
            struct($"event_id", $"user_id", $"event_type", $"value"),
            queries.EnvelopeOps.eventSchemaJson).as("payload"),
          lit(null).cast("binary").as("previous_payload"),
          lit(null).cast(graft.core.Envelope.sparkType("meta").dataType).as("meta"),
          lit(null).cast("string").as("encryption_type"),
          graft.core.Envelope.timestampInt(unix_timestamp($"ts")).as("timestamp"))
        val transport = Tables.events(spark, dir).filter(
          $"event_id".isNotNull && $"user_id".isNotNull &&
            $"event_type".isNotNull && $"value".isNotNull && $"ts".isNotNull)
          .select(graft.functions.pack_envelope(env).as("value"))
        val (good, _) = graft.streaming.Pipeline
          .consumeWithDeadLetters(transport, reg, v1)
        good.agg(count(lit(1)), sum($"payload.event_id"))
      })
      // corrupt-row decode cost: all rows planted corrupt (class 1 payload)
      stage(spark, p, "all_corrupt_payload")(() => {
        val reg = new graft.schema.SchemaRegistry
        val v1 = reg.registerSchema("demo", "event",
          queries.EnvelopeOps.eventSchemaJson).schemaId
        val env = struct(
          unhex(md5($"event_id".cast("string"))).as("uuid"),
          lit("create").as("message_type"),
          lit(v1).as("schema_id"),
          lit(Array(0xFF.toByte)).as("payload"),
          lit(null).cast("binary").as("previous_payload"),
          lit(null).cast(graft.core.Envelope.sparkType("meta").dataType).as("meta"),
          lit(null).cast("string").as("encryption_type"),
          graft.core.Envelope.timestampInt(unix_timestamp($"ts")).as("timestamp"))
        val transport = Tables.events(spark, dir).filter(
          $"event_id".isNotNull && $"user_id".isNotNull &&
            $"event_type".isNotNull && $"value".isNotNull && $"ts".isNotNull)
          .select(graft.functions.pack_envelope(env).as("value"))
        val (_, dead) = graft.streaming.Pipeline
          .consumeWithDeadLetters(transport, reg, v1)
        dead.groupBy($"schema_id").agg(count(lit(1)))
      })
      // corrupt transport: all rows 0xFF bytes (unpack fails every row)
      stage(spark, p, "all_corrupt_transport")(() => {
        val reg = new graft.schema.SchemaRegistry
        val v1 = reg.registerSchema("demo", "event",
          queries.EnvelopeOps.eventSchemaJson).schemaId
        val transport = Tables.events(spark, dir)
          .filter($"event_id".isNotNull)
          .select(lit(Array.fill(3)(0xFF.toByte)).as("value"))
        val (_, dead) = graft.streaming.Pipeline
          .consumeWithDeadLetters(transport, reg, v1)
        dead.groupBy($"schema_id").agg(count(lit(1)))
      })
    }

    // ---- minhash-LSH family decomposition ----
    if (want("lsh")) {
      val p = "lsh"
      import graft.operators.Dedup
      stage(spark, p, "d_minhash_lsh_full")(() =>
        SparkEntry.queries("d_minhash_lsh")(spark, dir))
      stage(spark, p, "d_dup_clusters_full")(() =>
        SparkEntry.queries("d_dup_clusters")(spark, dir))
      stage(spark, p, "shingles")(() =>
        Dedup.wordShingles(Tables.documents(spark, dir), "doc_id", "text", 3))
      stage(spark, p, "signatures")(() =>
        Dedup.minhashSignatures(
          Dedup.wordShingles(Tables.documents(spark, dir), "doc_id", "text", 3), 12))
      stage(spark, p, "bands")(() =>
        Dedup.lshBands(Dedup.minhashSignatures(
          Dedup.wordShingles(Tables.documents(spark, dir), "doc_id", "text", 3), 12), 12, 4))
      stage(spark, p, "cand_pairs")(() =>
        Dedup.lshCandidatePairs(Dedup.lshBands(Dedup.minhashSignatures(
          Dedup.wordShingles(Tables.documents(spark, dir), "doc_id", "text", 3), 12), 12, 4)))
      stage(spark, p, "verify_only_cached_sh")(() => {
        val sh = Dedup.wordShingles(Tables.documents(spark, dir), "doc_id", "text", 3).cache()
        val sigs = Dedup.minhashSignatures(sh, 12)
        val bands = Dedup.lshBands(sigs, 12, 4)
        Dedup.verifyJaccard(Dedup.lshCandidatePairs(bands), sh, 0.6)
      })
    }

    // ---- connected components alone (on precomputed pairs) ----
    if (want("cc")) {
      val p = "cc"
      import graft.operators.Dedup
      val sh = Dedup.wordShingles(Tables.documents(spark, dir), "doc_id", "text", 3).cache()
      val sigs = Dedup.minhashSignatures(sh, 12)
      val bands = Dedup.lshBands(sigs, 12, 4)
      val pairs = Dedup.verifyJaccard(Dedup.lshCandidatePairs(bands), sh, 0.6)
        .select(col("d1"), col("d2")).cache()
      pairs.count()
      stage(spark, p, "connected_components")(() =>
        Dedup.connectedComponents(pairs))
      pairs.unpersist()
      sh.unpersist()
    }

    // ---- d_ngram_near_dups decomposition ----
    if (want("ngram")) {
      val p = "ngram"
      import graft.operators.Dedup
      stage(spark, p, "full_query")(() =>
        SparkEntry.queries("d_ngram_near_dups")(spark, dir))
      stage(spark, p, "bucket_pairs_grouped")(() => {
        val sh = Dedup.wordShingles(Tables.documents(spark, dir), "doc_id", "text", 3).cache()
        Dedup.bucketPairs(sh, Seq("g"), "id", maxBucket = None)
          .select(col("x.pid").as("d1"), col("y.pid").as("d2"))
          .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("i"))
      })
    }

    // ---- d_incr_lsh decomposition ----
    if (want("incr")) {
      val p = "incr"
      import graft.operators.Dedup
      stage(spark, p, "full_query")(() =>
        SparkEntry.queries("d_incr_lsh")(spark, dir))
      stage(spark, p, "corpus_band_index")(() => {
        val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
        Dedup.buildBandIndex(docs.filter($"doc_id" % 3 =!= 0), "doc_id", "text", 3, 12, 4)
      })
    }

    // ---- ANN training/search decomposition ----
    if (want("ann")) {
      val p = "ann"
      import graft.operators.Similarity
      stage(spark, p, "sim_ivfpq_res_full")(() =>
        SparkEntry.queries("sim_ivfpq_res_topk")(spark, dir))
      stage(spark, p, "sim_pq_topk_full")(() =>
        SparkEntry.queries("sim_pq_topk")(spark, dir))
      stage(spark, p, "kmeans_fit_k8_i2")(() => {
        val vecs = Tables.validEmbeddings(spark, dir)
          .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        Similarity.kmeansFit(vecs.filter($"vec_id" % 4 === 0), k = 8, iters = 2)
      })
      stage(spark, p, "pq_fit_m4_i2")(() => {
        val vecs = Tables.validEmbeddings(spark, dir)
          .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        Similarity.pqFit(vecs.filter($"vec_id" % 4 === 0),
          m = 4, subDim = 16, ksub = 8, iters = 2)
      })
      stage(spark, p, "valid_embeddings_scan")(() =>
        Tables.validEmbeddings(spark, dir))
    }

    // ---- connected-components round-1 loop plan (reproduces the edge/
    // label join shape connectedComponents builds internally, so the
    // per-round exchange placement is visible — the loop's own plans
    // never appear in a query's static explain) ----
    if (want("ccplan")) {
      import graft.operators.Dedup
      val sh = Dedup.wordShingles(Tables.documents(spark, dir), "doc_id", "text", 3).cache()
      val sigs = Dedup.minhashSignatures(sh, 12)
      val bands = Dedup.lshBands(sigs, 12, 4)
      val pairs = Dedup.verifyJaccard(Dedup.lshCandidatePairs(bands), sh, 0.6)
        .select(col("d1"), col("d2")).cache()
      pairs.count()
      // the SHIPPED layout, via the operator's own package-private
      // helper — the probe can never drift from what the loop runs
      val edges = Dedup.ccEdgeLayout(pairs)
      // the pre-r19 shape (eagerly checkpointed edges, no layout) for
      // the before/after pair — same pairs, same loop join
      val edgesOld = pairs
        .select(explode(array(
          struct(col("d1").as("a"), col("d2").as("b")),
          struct(col("d2").as("a"), col("d1").as("b")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .localCheckpoint()
      // fresh frames per explain — a Dataset's queryExecution is cached,
      // so the broadcast-disabled (scale/SMJ) pass below must rebuild
      def round1(e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        val labels = e.select(col("a").as("id")).distinct()
          .select(col("id"), col("id").as("rep"))
          .localCheckpoint(eager = false)
        e.join(labels.select(col("id").as("b"), col("rep").as("nrep")), "b")
          .groupBy(col("a").as("id")).agg(min(col("nrep")).as("nmin"))
      }
      def show(title: String, df: org.apache.spark.sql.DataFrame): Unit = {
        println(s"========== $title ==========")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      show("cc round-1 neighborMin plan (r19 cached layout)", round1(edges))
      show("cc round-1 neighborMin plan (r18 checkpoint shape)", round1(edgesOld))
      // at corpus scale the label side outgrows the broadcast threshold
      // and the loop join becomes sort-merge — print the SMJ shapes too
      // (broadcast disabled), which is where the edge layout's
      // no-exchange/no-sort property actually pays
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        show("cc round-1 SMJ (scale) plan — r19 cached layout", round1(edges))
        show("cc round-1 SMJ (scale) plan — r18 checkpoint shape", round1(edgesOld))
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      edges.unpersist(blocking = false)
      pairs.unpersist(); sh.unpersist()
    }

    // ---- d_fuzzy_pairs / PassJoin block-size distribution (r18 verdict
    // #7): the blocked candidate join is quadratic WITHIN a block — a
    // hot segment key (mass common-affix keys, the OCR'd-code shape)
    // concentrates |idx_bk|·|prb_bk| candidate work in one task. This
    // probe measures the per-block cost distribution on a uniform vs a
    // skewed synthetic fixture so the "salt the hot block?" decision is
    // evidence, not guesswork. ----
    if (want("fuzzy")) {
      val p = "fuzzy"
      import graft.operators.Dedup
      stage(spark, p, "d_fuzzy_pairs_full")(() =>
        SparkEntry.queries("d_fuzzy_pairs")(spark, dir))
      def keysOf(mk: Column): DataFrame =
        spark.range(20000).toDF("i").select(mk.as("k")).distinct()
      val uniform = keysOf(substring(md5($"i".cast("string")), 1, 10))
      val skewed = keysOf(concat(lit("ITEM-"),
        lpad($"i".cast("string"), 5, "0")))
      for ((nm, keys) <- Seq(("uniform20k", uniform), ("skewprefix20k", skewed))) {
        val cached = keys.cache(); cached.count()
        // block-size distribution of the index side: the top block's
        // size² is the single-task candidate bound
        val top = cached.select($"k",
            explode(graft.functions.PassJoinKeys.pass_join_index($"k", 2)).as("bk"))
          .groupBy($"bk").count().orderBy($"count".desc).limit(5)
          .collect().map(_.getLong(1))
        println(s"[opt] $p $nm top index-block sizes: ${top.mkString(", ")}")
        stage(spark, p, s"key_pairs_$nm")(() =>
          Dedup.editDistanceKeyPairs(cached, 2))
        cached.unpersist(blocking = false)
      }
    }

    // ---- hybrid retrieval decomposition ----
    if (want("hybrid")) {
      val p = "hybrid"
      stage(spark, p, "sim_hybrid_mmr_full")(() =>
        SparkEntry.queries("sim_hybrid_mmr")(spark, dir))
      stage(spark, p, "sim_hybrid_rrf_full")(() =>
        SparkEntry.queries("sim_hybrid_rrf")(spark, dir))
      stage(spark, p, "sim_bm25_topk_full")(() =>
        SparkEntry.queries("sim_bm25_topk")(spark, dir))
      stage(spark, p, "sim_mmr_select_full")(() =>
        SparkEntry.queries("sim_mmr_select")(spark, dir))
      stage(spark, p, "brute_force_topk")(() => {
        val vecs = Tables.validEmbeddings(spark, dir)
          .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        val probes = vecs.filter($"vec_id" < 1)
          .select($"vec_id".as("probe_id"), $"v".as("p"))
        graft.operators.Similarity.bruteForceTopK(vecs, probes, k = 15)
      })
    }

    spark.stop()
  }
}
