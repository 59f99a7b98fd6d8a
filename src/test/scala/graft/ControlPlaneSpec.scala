package graft

import graft.refresh._
import graft.schema.SchemaRegistry
import graft.streaming.{ConsumerSource, ExactlyOnce, TopicRefreshController}

/** Driver-side control plane: exactly-once reconciliation, topic
  * discovery/refresh, priority scheduling, throughput caps, keyset scan
  * planning. */
class ControlPlaneSpec extends SparkTestBase {

  // --- exactly-once audit (reference: producer.py:291-422) -------------

  test("reconcile republishes only the unpublished tail") {
    val d = ExactlyOnce.reconcile(ExactlyOnce.TopicState(savedOffset = 100, highWatermark = 103),
      replaySize = 5)
    assert(d == ExactlyOnce.RepublishFrom(3))
  }

  test("reconcile with nothing published replays everything") {
    assert(ExactlyOnce.reconcile(ExactlyOnce.TopicState(100, 100), 5) ==
      ExactlyOnce.RepublishFrom(0))
  }

  test("watermark beyond the replay window is unensurable unless forced") {
    val st = ExactlyOnce.TopicState(100, 110)
    assert(ExactlyOnce.reconcile(st, 5) == ExactlyOnce.Unensurable(10, 5))
    assert(ExactlyOnce.reconcile(st, 5, allowForcedRecovery = true) ==
      ExactlyOnce.RepublishFrom(0))
  }

  test("failed produce whose count closed the watermark gap actually succeeded") {
    assert(ExactlyOnce.retrySucceededDespiteError(100, 105, 5))
    assert(!ExactlyOnce.retrySucceededDespiteError(100, 104, 5))
  }

  test("multi-topic reconcile decides per topic; one unensurable doesn't mask the rest") {
    val decisions = ExactlyOnce.reconcileAll(Map(
      "t_ok" -> (ExactlyOnce.TopicState(100, 102), 5),      // 2 already out
      "t_none" -> (ExactlyOnce.TopicState(50, 50), 3),      // nothing out
      "t_bad" -> (ExactlyOnce.TopicState(10, 99), 4)))      // beyond the buffer
    assert(decisions("t_ok") == ExactlyOnce.RepublishFrom(2))
    assert(decisions("t_none") == ExactlyOnce.RepublishFrom(0))
    assert(decisions("t_bad") == ExactlyOnce.Unensurable(89, 4))
    val forced = ExactlyOnce.reconcileAll(
      Map("t_bad" -> (ExactlyOnce.TopicState(10, 99), 4)), allowForcedRecovery = true)
    assert(forced("t_bad") == ExactlyOnce.RepublishFrom(0))
  }

  // --- consumer sources + refresh tick (consumer_source.py, ST7) -------

  private val schemaJson =
    """{"type":"record","name":"s1","namespace":"g","fields":[
         {"name":"f","type":"int","default":0}]}"""
  private val incompatibleJson =
    """{"type":"record","name":"s1","namespace":"g","fields":[
         {"name":"f","type":"string"}]}"""

  test("consumer sources resolve topic sets from the registry") {
    val reg = new SchemaRegistry
    val a = reg.registerSchema("ns1", "src_a", schemaJson)
    val b = reg.registerSchema("ns2", "src_b", schemaJson)
    assert(ConsumerSource.FixedTopics(Set("x")).resolve(reg) == Set("x"))
    assert(ConsumerSource.TopicsInNamespaces(Set("ns1")).resolve(reg) == Set(a.topicName))
    assert(ConsumerSource.TopicsInSource("ns2", "src_b").resolve(reg) == Set(b.topicName))
    assert(ConsumerSource.FixedSchemas(Set(a.schemaId)).resolve(reg) == Set(a.topicName))
    assert(ConsumerSource.FixedSchemas(Set(a.schemaId)).readerSchemaByTopic(reg) ==
      Map(a.topicName -> a.schemaId))
  }

  test("topic refresh tick reports added topics after incompatible evolution") {
    val reg = new SchemaRegistry
    val a = reg.registerSchema("ns", "src", schemaJson)
    val ctl = new TopicRefreshController(ConsumerSource.TopicsInSource("ns", "src"), reg)
    val first = ctl.tick()
    assert(first.changed && first.topics == Set(a.topicName))
    assert(!ctl.tick().changed) // steady state
    val b = reg.registerSchema("ns", "src", incompatibleJson) // new topic
    val third = ctl.tick()
    assert(third.changed && third.added == Set(b.topicName) && third.removed.isEmpty)
  }

  test("team validation: clients refuse unknown teams and missing emails") {
    import graft.streaming.{ExpectedFrequency, Registrar, Team}
    val teams = Team.parseConfig(
      """# sensu-style teams config
        |teams:
        |  bam:
        |    notification_email: bam@example.com
        |    pages: true
        |  ghosts:
        |    pages: false
        |other:
        |  ignored: yes
        |""".stripMargin)
    assert(teams.teamNames == Set("bam", "ghosts"))
    assert(teams.exists("bam") && !teams.exists("other"))
    assert(teams.get("bam").flatMap(_.notificationEmail).contains("bam@example.com"))
    // unknown team → InvalidTeamError (client.py:140-146)
    intercept[Team.InvalidTeamError](
      new Registrar(teams, "nope", "svc.client", "producer", ExpectedFrequency.Hourly))
    // a team without notification_email cannot register (client.py:69-72)
    // — a DISTINCT diagnostic from unknown-team: the team IS registered,
    // and "is not a registered team" sent operators down the wrong path
    val noEmail = intercept[IllegalArgumentException](
      new Registrar(teams, "ghosts", "svc.client", "producer", ExpectedFrequency.Hourly))
    assert(!noEmail.isInstanceOf[Team.InvalidTeamError] &&
      noEmail.getMessage.contains("notification_email"), noEmail.getMessage)
    intercept[IllegalArgumentException](
      new Registrar(teams, "bam", "svc.client", "publisher", ExpectedFrequency.Hourly))
    // quoted YAML values store WITHOUT the quote characters (a
    // literal-quoted address bounces every notification silently)
    val quoted = Team.parseConfig(
      """teams:
        |  dq:
        |    notification_email: "dq@example.com"
        |  sq:
        |    notification_email: 'sq@example.com'
        |""".stripMargin)
    assert(quoted.get("dq").flatMap(_.notificationEmail).contains("dq@example.com"))
    assert(quoted.get("sq").flatMap(_.notificationEmail).contains("sq@example.com"))
  }

  test("registrar folds last-seen per schema and renders registration messages") {
    import graft.streaming.{ExpectedFrequency, Registrar, Team}
    val teams = Team(Team.TeamInfo("bam", Some("bam@example.com")))
    val r = new Registrar(teams, "bam", "services.tracker", "consumer",
      ExpectedFrequency.Constantly)
    r.recordUsage(7, 1000L)
    r.recordUsage(7, 3000L)
    r.recordUsage(7, 2000L) // out-of-order: max wins
    r.recordUsage(9, 500L)
    assert(r.lastSeen == Map(7 -> 3000L, 9 -> 500L))
    assert(r.registrationMessages == Seq(
      ("bam", "services.tracker", "consumer", 3000L, 0, 7),
      ("bam", "services.tracker", "consumer", 500L, 0, 9)))
    val df = r.registrationMessagesDF(spark)
    assert(df.columns.toSeq == Seq("team_name", "client_name", "client_type",
      "timestamp", "expected_frequency_seconds", "schema_id"))
    assert(df.count() == 2)
    // the registration schema registers through the normal registry path
    val reg = new SchemaRegistry
    val entry = r.registrationSchema(reg)
    assert(entry.namespaceName == "graft.registration")
    // the shared platform schema is owned by the PLATFORM address, not
    // the calling tenant team (reference registrar.py:119): per-team
    // ownership churned last-writer-wins and routed platform
    // schema-change notices to an arbitrary tenant
    assert(reg.getSourceByName("graft.registration", "client_registration_message_v1")
      .get.ownerEmail == Registrar.PlatformOwnerEmail)
    // idempotent: same schema returns the same entry
    assert(r.registrationSchema(reg).schemaId == entry.schemaId)
  }

  test("consumer refuses a topic set spanning cluster types") {
    val reg = new SchemaRegistry
    val a = reg.registerSchema("ns", "src_k", schemaJson)
    val b = reg.registerSchema("ns", "src_s", schemaJson, clusterType = "scribe")
    // direct determination (base_consumer.py:238-256)
    assert(ConsumerSource.determineClusterType(reg, Set(a.topicName)).contains("datapipe"))
    assert(ConsumerSource.determineClusterType(reg, Set(b.topicName)).contains("scribe"))
    val ex = intercept[ConsumerSource.MultipleClusterTypeError](
      ConsumerSource.determineClusterType(reg, Set(a.topicName, b.topicName)))
    assert(ex.getMessage.contains("datapipe") && ex.getMessage.contains("scribe"))
    // unregistered topics carry no cluster type; empty set has none
    assert(ConsumerSource.determineClusterType(reg, Set("unknown")).isEmpty)

    // the refresh controller re-validates each tick (base_consumer.py:320)
    val ok = new TopicRefreshController(
      ConsumerSource.TopicsInSource("ns", "src_k"), reg)
    ok.tick()
    assert(ok.clusterType.contains("datapipe"))
    val mixed = new TopicRefreshController(
      ConsumerSource.TopicsInNamespaces(Set("ns")), reg)
    intercept[ConsumerSource.MultipleClusterTypeError](mixed.tick())
    // a rejected tick leaves the subscription untouched
    assert(mixed.currentTopics.isEmpty && mixed.clusterType.isEmpty)

    // a source forking to another cluster mid-stream fails the next tick
    reg.registerSchema("ns", "src_k", schemaJson, clusterType = "scribe")
    intercept[ConsumerSource.MultipleClusterTypeError](ok.tick())
    assert(ok.currentTopics == Set(a.topicName)) // old subscription intact
  }

  test("latest-topic source follows the newest topic across evolution") {
    val reg = new SchemaRegistry
    val a = reg.registerSchema("ns", "src", schemaJson)
    val src = ConsumerSource.LatestTopicInSource("ns", "src")
    assert(src.resolve(reg) == Set(a.topicName))
    val b = reg.registerSchema("ns", "src", incompatibleJson)
    assert(src.resolve(reg) == Set(b.topicName))
  }

  test("new-topics-only source returns the full set once, then only newcomers; uncommitted resolves re-surface") {
    val reg = new SchemaRegistry
    val a = reg.registerSchema("ns", "src", schemaJson)
    val src = new ConsumerSource.NewTopicsOnlyInSource("ns", "src")
    def tick(): Set[String] = { val out = src.resolve(reg); src.commit(); out }
    assert(tick() == Set(a.topicName)) // first query: everything
    assert(tick() == Set.empty)        // steady state: nothing new
    val b = reg.registerSchema("ns", "src", incompatibleJson)
    // resolve is a side-effect-free PREVIEW: a tick that fails validation
    // never commits, so the same topics re-surface next tick instead of
    // being lost forever
    assert(src.resolve(reg) == Set(b.topicName))
    assert(src.resolve(reg) == Set(b.topicName),
      "an uncommitted resolve must not advance the cutoff")
    assert(tick() == Set(b.topicName)) // committed now
    assert(tick() == Set.empty)
  }

  test("new-topics-only per-namespace cursors advance independently") {
    val reg = new SchemaRegistry
    val a1 = reg.registerSchema("ns1", "sa", schemaJson)
    val src = new ConsumerSource.NewTopicsOnlyInNamespaces(Set("ns1", "ns2"))
    def tick(): Set[String] = { val out = src.resolve(reg); src.commit(); out }
    assert(tick() == Set(a1.topicName))
    val b1 = reg.registerSchema("ns2", "sb", schemaJson)
    val a2 = reg.registerSchema("ns1", "sa", incompatibleJson)
    assert(tick() == Set(b1.topicName, a2.topicName))
    assert(tick() == Set.empty)
  }

  test("new-topics-only data-target scope sees topics via consumer-group sources") {
    val reg = new SchemaRegistry
    val t = reg.createDataTarget("redshift", "redshift", "jdbc:...")
    val g = reg.createConsumerGroup("etl", t.dataTargetId)
    reg.addConsumerGroupDataSource(g.consumerGroupId, "ns", None)
    val a = reg.registerSchema("ns", "src", schemaJson)
    val src = new ConsumerSource.NewTopicsOnlyInDataTarget(t.dataTargetId)
    def tick(): Set[String] = { val out = src.resolve(reg); src.commit(); out }
    assert(tick() == Set(a.topicName))
    assert(tick() == Set.empty)
    val b = reg.registerSchema("ns", "src", incompatibleJson)
    assert(tick() == Set(b.topicName))
    // out-of-scope namespaces never appear
    reg.registerSchema("elsewhere", "x", schemaJson)
    assert(tick() == Set.empty)
  }

  test("controller appends for incremental sources instead of dropping the subscription") {
    val reg = new SchemaRegistry
    val a = reg.registerSchema("ns", "src", schemaJson)
    val ctl = new TopicRefreshController(
      new ConsumerSource.NewTopicsOnlyInSource("ns", "src"), reg)
    assert(ctl.tick().topics == Set(a.topicName))
    // nothing new: an empty resolution must NOT unsubscribe topic a
    val steady = ctl.tick()
    assert(!steady.changed && steady.topics == Set(a.topicName))
    val b = reg.registerSchema("ns", "src", incompatibleJson)
    val grown = ctl.tick()
    assert(grown.added == Set(b.topicName) && grown.removed.isEmpty &&
      grown.topics == Set(a.topicName, b.topicName))
  }

  // --- priority refresh queue (priority_refresh_queue.py:68-116) -------

  private def job(id: Int, src: String, status: RefreshStatus.Value,
                  priority: Int, created: Long) =
    RefreshJob(id, "ns", src, status, 0L, 100, priority, None, None, created)

  test("queue orders by priority desc, paused-first, created asc; one per source") {
    val jobs = Seq(
      job(1, "s1", RefreshStatus.NotStarted, 50, 10),
      job(2, "s1", RefreshStatus.Paused, 50, 20), // paused beats not-started at same prio
      job(3, "s1", RefreshStatus.NotStarted, 100, 30), // higher priority wins
      job(4, "s2", RefreshStatus.NotStarted, 75, 5),
      job(5, "s3", RefreshStatus.Success, 100, 1)) // terminal: not queueable
    val sched = PriorityRefreshQueue.schedule(jobs)
    assert(sched.map(_.refreshId) == Seq(3, 4))
  }

  test("paused-first applies within equal priority") {
    val jobs = Seq(
      job(1, "s1", RefreshStatus.NotStarted, 50, 1),
      job(2, "s1", RefreshStatus.Paused, 50, 99))
    assert(PriorityRefreshQueue.schedule(jobs).map(_.refreshId) == Seq(2))
  }

  test("DataFrame scheduling matches the in-memory queue") {
    import spark.implicits._
    val df = Seq(
      (1, "ns", "s1", "NOT_STARTED", 50, 10L),
      (2, "ns", "s1", "PAUSED", 50, 20L),
      (3, "ns", "s1", "NOT_STARTED", 100, 30L),
      (4, "ns", "s2", "NOT_STARTED", 75, 5L),
      (5, "ns", "s3", "SUCCESS", 100, 1L)
    ).toDF("refresh_id", "namespace_name", "source_name", "status", "priority", "created_at")
    val got = PriorityRefreshQueue.scheduleDF(df).select("refresh_id")
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(3, 4))
  }

  // --- throughput allocation (refresh_manager.py:331-365) --------------

  test("caps pass through under budget and scale down proportionally over it") {
    val under = Seq(job(1, "a", RefreshStatus.NotStarted, 50, 1),
      job(2, "b", RefreshStatus.NotStarted, 50, 2))
    assert(ThroughputAllocator.allocate(under) == Map(1 -> 50, 2 -> 50))
    val over = (1 to 30).map(i => job(i, s"s$i", RefreshStatus.NotStarted, 50, i.toLong))
    val caps = ThroughputAllocator.allocate(over) // 30*50=1500 > 1000
    assert(caps.values.sum <= 1000)
    assert(caps.values.forall(c => c == 33))
  }

  // --- keyset scan planning (copy_table_to_blackhole_table.py) ---------

  test("keyset ranges tile (min, max] without overlap") {
    val ranges = RefreshScan.keysetRanges(0, 1000, 300)
    assert(ranges == Seq((0L, 300L), (300L, 600L), (600L, 900L), (900L, 1000L)))
    val preds = RefreshScan.keysetPredicates("pk", 0, 700, 300, where = Some("x > 1"))
    assert(preds.head == "pk > 0 AND pk <= 300 AND (x > 1)")
    assert(preds.length == 3)
  }

  test("scan batches cover the orders table exactly once") {
    val orders = Tables.orders(spark, sf())
    val bounds = orders.agg(
      org.apache.spark.sql.functions.min("o_orderkey"),
      org.apache.spark.sql.functions.max("o_orderkey")).head()
    val (lo, hi) = (bounds.getLong(0) - 1, bounds.getLong(1))
    val total = RefreshScan.keysetRanges(lo, hi, 500).map { case (a, b) =>
      RefreshScan.scanBatch(orders, "o_orderkey", a, b).count()
    }.sum
    assert(total == orders.count())
  }
}
