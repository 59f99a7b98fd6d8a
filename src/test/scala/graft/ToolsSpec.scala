package graft

import org.apache.spark.sql.functions._

import graft.core.NamespaceInfo
import graft.functions.SimHash64
import graft.operators.Multimodal
import graft.schema.SchemaRegistry
import graft.tools.{Introspector, RedshiftDdlConverter, Tailer}

class ToolsSpec extends SparkTestBase {

  // --- Redshift DDL -> Avro (redshift_sql_to_avsc.py semantics) --------

  test("redshift DDL converts with type metas, nullability and pkeys") {
    val spec = RedshiftDdlConverter.parse(
      """CREATE TABLE analytics.prices (
           id BIGINT NOT NULL PRIMARY KEY,
           name VARCHAR(64) NULL DEFAULT NULL,
           code CHAR(3),
           price DECIMAL(10,2),
           n_units INT DEFAULT 0,
           created TIMESTAMP,
           day DATE
         );""")
    assert(spec.schema == "analytics" && spec.table == "prices")
    assert(spec.primaryKeys == Seq("id"))
    val json = spec.avroSchemaJson
    val parsed = new org.apache.avro.Schema.Parser().parse(json)
    assert(parsed.getField("id").schema().getType == org.apache.avro.Schema.Type.LONG)
    // nullable with default null -> ["null", T]
    assert(parsed.getField("name").schema().getTypes.get(0).getType ==
      org.apache.avro.Schema.Type.NULL)
    // nullable with non-null default -> [T, "null"]
    assert(parsed.getField("n_units").schema().getTypes.get(0).getType ==
      org.apache.avro.Schema.Type.INT)
    assert(parsed.getField("name").getObjectProp("maxlen") == 64)
    assert(parsed.getField("code").getObjectProp("fixlen") == 3)
    assert(parsed.getField("price").getObjectProp("fixed_pt") == true)
    assert(parsed.getField("price").getObjectProp("precision") == 10)
    assert(parsed.getField("created").getObjectProp("timestamp") == true)
    assert(spec.structType.fields.map(_.dataType).toSeq.contains(
      org.apache.spark.sql.types.DecimalType(10, 2)))
  }

  test("redshift: keyword-prefixed column names survive; SORTKEY/DISTKEY suffix stays out of the body") {
    val spec = RedshiftDdlConverter.parse(
      """CREATE TABLE s.metrics (
           unique_visitors INT,
           day DATE NOT NULL,
           UNIQUE (day)
         ) DISTKEY(day) COMPOUND SORTKEY(day, unique_visitors);""")
    assert(spec.columns.map(_.name) == Seq("unique_visitors", "day"),
      s"got ${spec.columns.map(_.name)}")
  }

  test("table-level PRIMARY KEY assigns pkey ordinals in list order") {
    val spec = RedshiftDdlConverter.parse(
      """CREATE TABLE s.t (a INT, b VARCHAR(10), c INT, PRIMARY KEY (b, a));""")
    assert(spec.primaryKeys == Seq("b", "a"))
    // converted schema registers cleanly and pkeys flow to the registry
    val reg = new SchemaRegistry
    val entry = reg.registerSchema(spec.schema, spec.table, spec.avroSchemaJson)
    assert(entry.primaryKeys == Seq("b", "a"))
  }

  // --- Tailer (tools/tailer.py) -----------------------------------------

  test("topic spec parses with and without offsets; offsets validate") {
    assert(Tailer.parseTopicSpec("my.topic.v1|42") ==
      Tailer.TopicSpec("my.topic.v1", Some(42L)))
    assert(Tailer.parseTopicSpec("my.topic.v1") == Tailer.TopicSpec("my.topic.v1", None))
    Tailer.validateOffset(5, 0, 10)
    intercept[IllegalArgumentException](Tailer.validateOffset(11, 0, 10))
  }

  test("tailer bounds wire into kafka source options") {
    val specs = Seq(Tailer.TopicSpec("t.a.v1", Some(42L)), Tailer.TopicSpec("t.b.v2", None))
    val byOffset = Tailer.kafkaOptions("b:9092", specs)
    assert(byOffset("subscribe") == "t.a.v1,t.b.v2")
    // Spark rejects a specific-offsets JSON that omits a subscribed
    // topic: the offset-less topic rides the -2 (earliest) sentinel
    assert(byOffset("startingOffsets") == """{"t.a.v1": {"0": 42}, "t.b.v2": {"0": -2}}""")
    // a tailer inspects EXACT positions — out-of-range seeks must error,
    // never silently reset
    assert(byOffset("failOnDataLoss") == "true")
    // explicit offsets and a timestamp seek are mutually exclusive in
    // the Kafka source: refused loudly, never silently discarded
    intercept[IllegalArgumentException] {
      Tailer.kafkaOptions("b:9092", specs, startTimestampSec = Some(1700000000L))
    }
    val byTime = Tailer.kafkaOptions("b:9092",
      specs.map(_.copy(offset = None)), startTimestampSec = Some(1700000000L))
    assert(byTime("startingTimestamp") == "1700000000000")
    assert(byTime("failOnDataLoss") == "true")
  }

  test("tail projects fields, formats ISO time, bounds and limits") {
    import spark.implicits._
    val consumed = Seq(
      (Array[Byte](1, 2), "create", 1, 1700000000),
      (Array[Byte](3, 4), "update", 1, 1700000600),
      (Array[Byte](5, 6), "delete", 1, 1700001200)
    ).toDF("uuid", "message_type", "schema_id", "timestamp")
    val out = Tailer.tail(consumed,
      fields = Seq("uuid", "message_type", "timestamp"),
      isoTime = true,
      startTimestamp = Some(1700000300L),
      messageLimit = Some(1))
    val row = out.head()
    assert(row.getString(0) == "0304")
    assert(row.getString(2) == "2023-11-14T22:23:20")
    assert(out.count() == 1)
    val json = Tailer.tail(consumed, fields = Seq("message_type"), json = true)
      .collect().map(_.getString(0)).sorted
    assert(json.head == """{"message_type":"create"}""")
  }

  // --- Introspector ------------------------------------------------------

  test("introspector reports topic info and watermarks") {
    import spark.implicits._
    val reg = new SchemaRegistry
    val s1 = reg.registerSchema("ns", "src",
      """{"type":"record","name":"r","namespace":"g","fields":[
           {"name":"f","type":"int","default":0}]}""")
    val info = Introspector.topicInfo(spark, reg)
    assert(info.count() == 1)
    assert(info.head().getAs[Int]("latest_schema_id") == s1.schemaId)

    val transport = Seq(("t1", 5L), ("t1", 9L), ("t2", 0L)).toDF("topic", "offset")
    val w = Introspector.topicWatermarks(transport).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(w.toSeq == Seq(("t1", 5L, 10L), ("t2", 0L, 1L)))
  }

  // --- Introspector command suite (tools/introspector/) ------------------

  private val introBase =
    """{"type":"record","name":"r","namespace":"g","fields":[
         {"name":"f","type":"int","default":0}]}"""
  private val introCompat =
    """{"type":"record","name":"r","namespace":"g","fields":[
         {"name":"f","type":"int","default":0},
         {"name":"g","type":"int","default":1}]}"""
  private val introIncompat =
    """{"type":"record","name":"r","namespace":"g","fields":[
         {"name":"f","type":"int","default":0},
         {"name":"breaking","type":"string"}]}"""

  /** nsA: users (2 topics — incompatible fork) + orders; nsB: logs.
    * Transport has 3 messages on the forked users topic and a ghost topic
    * the registry doesn't know (must not count as active). */
  private def introFixture = {
    val reg = new SchemaRegistry
    val a1 = reg.registerSchema("nsA", "users", introBase, sourceOwnerEmail = "u@example.com")
    val a2 = reg.registerSchema("nsA", "users", introIncompat)
    val b1 = reg.registerSchema("nsA", "orders", introBase)
    val c1 = reg.registerSchema("nsB", "logs", introBase)
    reg.setSchemaNote(a1.schemaId, "first users schema")
    import spark.implicits._
    val transport = Seq(
      (a2.topicName, 0L), (a2.topicName, 1L), (a2.topicName, 2L),
      ("ghost.topic.v9", 0L)
    ).toDF("topic", "offset")
    (reg, Introspector.withTransport(reg, transport), a1, a2, b1, c1)
  }

  test("introspector list topics: default order, sort-by parity, watermark enrichment") {
    val (_, cmds, a1, a2, b1, _) = introFixture
    // default: updated_at descending (base_command.py:281)
    val topics = cmds.listTopics(namespaceName = Some("nsA"))
    assert(topics.map(_.name) == Seq(b1.topicName, a2.topicName, a1.topicName))
    assert(topics.find(_.name == a2.topicName).get.messageCount.contains(3L))
    assert(topics.find(_.name == a1.topicName).get.messageCount.contains(0L))
    assert(topics.find(_.name == a2.topicName).get.inKafka.contains(true))
    assert(topics.find(_.name == a1.topicName).get.inKafka.contains(false))
    // explicit sort: name ascending
    val byName = cmds.listTopics(namespaceName = Some("nsA"), sortBy = Some("name"))
    assert(byName.map(_.name) == Seq(b1.topicName, a1.topicName, a2.topicName))
    // message_count descending — ties keep the default (updated_at desc)
    // order because the secondary sort is stable
    val byCount = cmds.listTopics(namespaceName = Some("nsA"),
      sortBy = Some("message_count"), descendingOrder = true)
    assert(byCount.map(_.name) == Seq(a2.topicName, b1.topicName, a1.topicName))
    // unknown sort field is the reference's parser error
    intercept[IllegalArgumentException](
      cmds.listTopics(namespaceName = Some("nsA"), sortBy = Some("bogus")))
  }

  test("introspector list topics by source id") {
    val (reg, cmds, a1, a2, _, _) = introFixture
    val usersId = reg.getSourceByName("nsA", "users").get.sourceId
    val byId = cmds.listTopics(sourceId = Some(usersId))
    assert(byId.map(_.name) == Seq(a2.topicName, a1.topicName))
    assert(byId.forall(_.sourceId == usersId))
    intercept[NoSuchElementException](cmds.listTopics(sourceId = Some(999)))
  }

  test("introspector list sources and namespaces with active counts") {
    val (reg, cmds, _, a2, _, _) = introFixture
    val usersId = reg.getSourceByName("nsA", "users").get.sourceId
    // default order: source_id descending (base_command.py:311)
    val all = cmds.listSources()
    assert(all.map(_.sourceId) == Seq(3, 2, 1))
    assert(all.forall(_.activeTopicCount.isEmpty)) // not requested
    val active = cmds.listSources(activeSources = true)
    assert(active.find(_.sourceId == usersId).get.activeTopicCount.contains(1))
    assert(active.filter(_.sourceId != usersId).forall(_.activeTopicCount.contains(0)))
    // owner email came through the registration path
    assert(all.find(_.sourceId == usersId).get.ownerEmail == "u@example.com")
    // namespaces: id descending, active rollups (source count, topic count)
    val ns = cmds.listNamespaces(activeNamespaces = true)
    assert(ns.map(_.name) == Seq("nsB", "nsA"))
    assert(ns.find(_.name == "nsA").get.activeSourceCount.contains(1))
    assert(ns.find(_.name == "nsA").get.activeTopicCount.contains(1))
    assert(ns.find(_.name == "nsB").get.activeSourceCount.contains(0))
    // the ghost transport topic never made anything active
    assert(cmds.activeTopicNames == Set(a2.topicName))
  }

  test("introspector info commands: namespace, source, topic") {
    val (reg, cmds, a1, a2, _, _) = introFixture
    val nsInfo = cmds.infoNamespace("nsA")
    assert(nsInfo.namespace.namespaceId == 1)
    assert(nsInfo.sources.map(_.name).toSet == Set("users", "orders"))
    intercept[IllegalArgumentException](cmds.infoNamespace("missing"))

    val usersId = reg.getSourceByName("nsA", "users").get.sourceId
    // by id and by (name, namespace) resolve identically
    val byId = cmds.infoSource(sourceId = Some(usersId))
    val byName = cmds.infoSource(sourceName = Some("users"), namespaceName = Some("nsA"))
    assert(byId.source == byName.source && byId.topics == byName.topics)
    assert(byId.topics.map(_.name) == Seq(a2.topicName, a1.topicName))
    // name without namespace is the reference's parser error
    val ex = intercept[IllegalArgumentException](
      cmds.infoSource(sourceName = Some("users")))
    assert(ex.getMessage.contains("--namespace must be provided"))
    intercept[IllegalArgumentException](
      cmds.infoSource(sourceName = Some("nope"), namespaceName = Some("nsA")))
    // active topic count derives from the watermark-enriched topic rows
    assert(cmds.infoSource(sourceId = Some(usersId), activeSources = true)
      .source.activeTopicCount.contains(1))

    val tInfo = cmds.infoTopic(a1.topicName)
    assert(tInfo.schemas.map(_.schemaId) == Seq(a1.schemaId))
    // a1's topic was superseded by the incompatible fork: read-only
    assert(tInfo.schemas.head.status == "R")
    assert(tInfo.schemas.head.note.contains("first users schema"))
    assert(cmds.infoTopic(a2.topicName).schemas.head.status == "RW")
    intercept[IllegalArgumentException](cmds.infoTopic("no.such.topic"))
  }

  test("introspector register and schema-check commands") {
    val (reg, cmds, _, _, _, _) = introFixture
    // register avro: compatible-with-nothing-on-latest-topic forks again;
    // returned row carries the topic (print_schema include_topic_info)
    val r = cmds.registerAvro("nsA", "users", introCompat, "new@example.com")
    assert(r.status == "RW" && r.topic.isDefined)
    assert(reg.getSourceByName("nsA", "users").get.ownerEmail == "new@example.com")
    // register mysql delegates to the DDL converter
    val m = cmds.registerMysql("nsB", "biz",
      "CREATE TABLE biz (id BIGINT NOT NULL, name VARCHAR(32))",
      sourceOwnerEmail = "db@example.com")
    assert(m.topic.isDefined && m.topic.get.namespace == "nsB")
    assert(reg.getLatestSchemaByTopicName(m.topic.get.name).get.schemaId == m.schemaId)
    // schema-check: mutual compatibility against ALL schemas of a source
    assert(cmds.schemaCheck(introCompat, "orders", "nsA"))
    assert(!cmds.schemaCheck(introIncompat, "orders", "nsA"))
    // catalog-only suite: kafka columns absent, like the reference models
    // without kafka_topics/range maps
    val dry = Introspector.catalogOnly(reg)
    assert(dry.listTopics(namespaceName = Some("nsA"))
      .forall(t => t.inKafka.isEmpty && t.messageCount.isEmpty))
  }

  // --- namespace util (_namespace_util.py) ------------------------------

  test("namespace names parse and rebuild") {
    val n = NamespaceInfo.parse("main.db01.yelp.transformed")
    assert(n == NamespaceInfo(Some("main"), "db01", "yelp", Seq("transformed")))
    assert(n.name == "main.db01.yelp.transformed")
    assert(NamespaceInfo.parse("db01.yelp") == NamespaceInfo(None, "db01", "yelp", Nil))
    intercept[IllegalArgumentException](NamespaceInfo.parse("solo"))
  }

  // --- simhash -----------------------------------------------------------

  test("simhash: identical token sets collide, near sets are close, far sets far") {
    import spark.implicits._
    val df = Seq(
      (1, "the quick brown fox jumps over the lazy dog"),
      (2, "the quick brown fox jumps over the lazy dog"),
      (3, "the quick brown fox leaps over the lazy dog"),
      (4, "completely unrelated words about spark query engines")
    ).toDF("id", "text")
      .select($"id", SimHash64.simhash64(split($"text", " ")).as("h"))
    val h = df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(h(1) == h(2))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1), h(3)) < 20)
    assert(ham(h(1), h(4)) > ham(h(1), h(3)))
    // builtin hamming column matches JVM bitCount
    val viaCol = Seq((h(1), h(3))).toDF("a", "b")
      .select(SimHash64.hamming($"a", $"b")).head().getInt(0)
    assert(viaCol == ham(h(1), h(3)))
  }

  // --- multimodal --------------------------------------------------------

  test("multimodal: header meta and batched decode recover synthesized dims") {
    import spark.implicits._
    val df = Seq((1, 640, 480, "payload-bytes-here"), (2, 100, 50, "x"))
      .toDF("id", "w", "h", "data")
      .select($"id", $"w", $"h",
        Multimodal.syntheticContent($"w", $"h", $"data").as("content"))
    val meta = df.select($"id", Multimodal.extractMeta($"content", "image").as("m"))
      .select($"id", $"m.width", $"m.height").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(meta.toSeq == Seq((1, 640, 480), (2, 100, 50)))

    val decoded = Multimodal.decodePartitioned(df, "content", batchSize = 1)
    val rows = decoded.select($"id", $"decoded_width", $"decoded_height", $"payload_checksum")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3))).sortBy(_._1)
    assert(rows(0)._2 == 640 && rows(0)._3 == 480)
    assert(rows(0)._4 == "payload-bytes-here".getBytes("UTF-8").map(_ & 0xff).sum.toLong)
    // garbage content dead-letters to nulls, not task failure
    val bad = Seq((9, Array[Byte](1, 2, 3))).toDF("id", "content")
    val badOut = Multimodal.decodePartitioned(bad, "content").head()
    assert(badOut.isNullAt(2) && badOut.isNullAt(3))
  }

  test("multimodal: decodePartitioned decodes real PNG/BMP bytes via ImageIO") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO

    // handcrafted 3×2 image with distinct known pixels
    val pixels = Array(
      Array(0xff0000, 0x00ff00, 0x0000ff),
      Array(0x123456, 0xffffff, 0x000000))
    val img = new BufferedImage(3, 2, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 3) img.setRGB(x, y, pixels(y)(x))
    def bytesAs(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"JDK must ship a $fmt writer")
      bos.toByteArray
    }
    // expected checksum: sum of 32-bit ARGB values as unsigned ints
    val expected = pixels.flatten.map(p => (0xff000000 | p) & 0xffffffffL).sum

    val df = Seq((1, bytesAs("png")), (2, bytesAs("bmp"))).toDF("id", "content")
    val out = Multimodal.decodePartitioned(df, "content", batchSize = 2)
      .select($"id", $"decoded_width", $"decoded_height", $"payload_checksum")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .sortBy(_._1)
    // same pixels → identical checksum regardless of source encoding
    assert(out.toSeq == Seq((1, 3, 2, expected), (2, 3, 2, expected)))

    // PNG shorter than 12 bytes or truncated garbage still dead-letters
    val truncated = bytesAs("png").take(20)
    val badOut = Multimodal.decodePartitioned(
      Seq((9, truncated)).toDF("id", "content"), "content").head()
    assert(badOut.isNullAt(2) && badOut.isNullAt(3))
  }

  test("multimodal: hostile media bytes poison their row, never the task (hostile-MEDIA wave)") {
    // the r15 verdict's hostile-MEDIA list, fed DIRECTLY to every
    // multimodal entry point as crafted bytes (the m_* queries synthesize
    // valid GMM1 from documents, so wrong-magic/truncated/lying headers
    // can only be exercised at the operator seam): each hostile object
    // must yield a null-poisoned row — a 100 TB media column always
    // contains a few of each, and one of them failing the task kills the
    // whole job after 4 retries
    import spark.implicits._
    def gmm1(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + payload.length)
      bb.put(Multimodal.Magic).putInt(w).putInt(h).put(payload)
      bb.array()
    }
    val bigPayload = Array.fill[Byte](4 * 1024 * 1024)('a'.toByte)
    // a real PNG whose IHDR dims are patched to lie (50000×50000) without
    // fixing the CRC — the real-codec path must reject it (CRC check or
    // decompression-bomb guard), not allocate a 10 GB raster or kill the task
    val lyingPng = {
      val img = new java.awt.image.BufferedImage(
        2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val b = bos.toByteArray
      val bb = java.nio.ByteBuffer.wrap(b)
      bb.putInt(16, 50000); bb.putInt(20, 50000) // IHDR width/height
      b
    }
    val rows = Seq(
      (1L, gmm1(8, 4, "good payload".getBytes("UTF-8"))), // control
      (2L, Multimodal.Magic ++ Array[Byte](0, 0)),        // truncated header
      (3L, "ZZZZ      pay"
        .getBytes("ISO-8859-1")),                         // wrong magic
      (4L, gmm1(0, 0, "zero dims".getBytes("UTF-8"))),    // zero-dimension
      (5L, null.asInstanceOf[Array[Byte]]),               // null content
      (6L, gmm1(1920, 1080, bigPayload)),                 // multi-MB blob
      (7L, gmm1(2, 2, "first".getBytes("UTF-8"))),        // dup media id ...
      (7L, gmm1(3, 3, "second".getBytes("UTF-8"))),       // ... both kept
      (8L, lyingPng),                                     // lying real header
      (9L, gmm1(Int.MaxValue, Int.MaxValue,
        "tiny".getBytes("UTF-8"))))                       // lying GMM1 header
    val df = rows.toDF("id", "content")

    // header-only meta: pure column ops — reports DECLARED dims (its
    // contract), null content → null fields, truncated header → partial
    val meta = df.select($"id", Multimodal.extractMeta($"content", "image").as("m"))
      .select($"id", $"m.width", $"m.height", $"m.n_bytes").collect()
    assert(meta.length == rows.size)
    val metaById = meta.groupBy(_.getLong(0))
    assert(metaById(4L).head.getInt(1) == 0 && metaById(4L).head.getInt(2) == 0)
    assert(metaById(5L).head.isNullAt(1) && metaById(5L).head.isNullAt(3))
    assert(metaById(6L).head.getLong(3) == 12L + bigPayload.length)

    // batched decode: control + big blob decode; every hostile row → nulls
    val dec = Multimodal.decodePartitioned(df, "content", batchSize = 3)
      .select($"id", $"decoded_width", $"decoded_height", $"payload_checksum")
      .collect()
    assert(dec.length == rows.size, "a hostile row must not drop or fail the task")
    val decById = dec.groupBy(_.getLong(0))
    assert(decById(1L).head.getInt(1) == 8 &&
      decById(1L).head.getLong(3) == "good payload".getBytes("UTF-8").map(_ & 0xff).sum.toLong)
    assert(decById(6L).head.getLong(3) == bigPayload.map(_ & 0xff).map(_.toLong).sum)
    Seq(2L, 3L, 5L, 8L).foreach(id => assert(decById(id).head.isNullAt(3),
      s"hostile id=$id must decode to a null row"))
    // lying GMM1 header: the synthetic path trusts declared dims only as
    // reported metadata — the checksum still sums the ACTUAL payload
    assert(decById(9L).head.getLong(3) == "tiny".getBytes("UTF-8").map(_ & 0xff).sum.toLong)
    assert(decById(7L).map(_.getLong(3)).toSet.size == 2,
      "duplicate media ids are two rows, both decoded")

    // frame slices + resize: column arithmetic over hostile lengths must
    // not throw (negative payload lengths, zero widths)
    val sliced = df.select($"id",
      Multimodal.frameSlices($"content", 4).as("fr"),
      Multimodal.resizeStub($"content", lit(320), lit(240)).as("rz"))
      .collect()
    assert(sliced.length == rows.size)
    val r5 = sliced.find(_.getLong(0) == 5L).get
    assert(r5.isNullAt(2), "resize of null content must be null")
    assert(r5.getSeq[AnyRef](1) == null || r5.getSeq[AnyRef](1).forall(_ == null),
      "frame slices of null content must all be null")

    // histogram seam: non-GMM1/null → null hist, control intact
    val hists = Multimodal.byteHistogram(df, "content", bins = 16)
      .select($"id", $"hist").collect().groupBy(_.getLong(0))
    assert(!hists(1L).head.isNullAt(1))
    Seq(2L, 3L, 5L, 8L).foreach(id => assert(hists(id).head.isNullAt(1)))
  }

  test("pii redaction replaces emails and phone-like numbers, counts match") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val df = Seq((1L, "write to bob.smith@corp.io or call 555-1234 now maybe 555-999"))
      .toDF("id", "s")
    val (e, p) = TextAnalysis.piiCounts($"s")
    val row = df.select(TextAnalysis.redactPii($"s"), e, p).head()
    assert(row.getString(0) == "write to <EMAIL> or call <PHONE> now maybe 555-999")
    assert(row.getLong(1) == 1L && row.getLong(2) == 1L)
  }

  test("bootstrapper registers avsc and sql files from globs, idempotently") {
    import java.nio.file.Files
    import graft.schema.SchemaRegistry
    import graft.tools.Bootstrapper
    val dir = Files.createTempDirectory("bootstrap")
    Files.write(dir.resolve("biz.avsc"),
      """{"type":"record","name":"biz","namespace":"yelp","fields":[
           {"name":"id","type":"int","pkey":1}]}""".getBytes("UTF-8"))
    Files.write(dir.resolve("users.sql"),
      """CREATE TABLE app.users (
           user_id BIGINT PRIMARY KEY,
           name VARCHAR(64) NOT NULL
         );""".getBytes("UTF-8"))
    Files.write(dir.resolve("notes.txt"), "ignored".getBytes("UTF-8"))

    val reg = new SchemaRegistry
    val entries = Bootstrapper.bootstrap(reg, Seq(s"$dir/*.avsc", s"$dir/*.sql"))
    assert(entries.map(e => (e.namespaceName, e.sourceName)) ==
      Seq(("yelp", "biz"), ("app", "users")))
    assert(entries.head.primaryKeys == Seq("id"))
    assert(entries(1).primaryKeys == Seq("user_id"))
    // idempotent: same files -> same schema ids, no new topics
    val again = Bootstrapper.bootstrap(reg, Seq(s"$dir/*.avsc", s"$dir/*.sql"))
    assert(again.map(_.schemaId) == entries.map(_.schemaId))
    assert(reg.topics.size == 2)
  }

  test("multimodal: resize stub rewrites header and crops payload proportionally") {
    import spark.implicits._
    val df = Seq((1, 640, 480, "0123456789abcdef")).toDF("id", "w", "h", "data")
      .select($"id", Multimodal.syntheticContent($"w", $"h", $"data").as("content"))
    val resized = df.select($"id",
      Multimodal.resizeStub($"content", lit(320), lit(240)).as("content"))
    val m = resized.select(Multimodal.extractMeta($"content", "image").as("m"))
      .select($"m.width", $"m.height", $"m.n_bytes").head()
    assert(m.getInt(0) == 320 && m.getInt(1) == 240)
    assert(m.getLong(2) == 12 + 8) // 16 payload bytes * 320/640
  }

  test("multimodal: byteHistogram counts payload code points mod bins") {
    import spark.implicits._
    val df = Seq((1, "aAaB")).toDF("id", "data")
      .select($"id", Multimodal.syntheticContent(lit(4), lit(2), $"data").as("content"))
    val hist = Multimodal.byteHistogram(df, "content", bins = 16)
      .select($"hist").head().getSeq[Long](0)
    // 'a'=97 -> bin 1 (x2), 'A'=65 -> bin 1, 'B'=66 -> bin 2
    assert(hist.sum == 4L)
    assert(hist(1) == 3L && hist(2) == 1L)
    // garbage content yields null hist, not task failure
    val bad = Seq((9, Array[Byte](1, 2, 3))).toDF("id", "content")
    assert(Multimodal.byteHistogram(bad, "content").select($"hist").head().isNullAt(0))
  }

  test("compaction setter compacts pkey topics, honors overrides, reports misses") {
    import graft.tools.CompactionSetter
    val reg = new graft.schema.SchemaRegistry
    val keyed = reg.registerSchema("ns", "keyed",
      """{"type":"record","name":"keyed","namespace":"ns","fields":[
         {"name":"id","type":"int","pkey":1},{"name":"v","type":"string"}]}""")
    val keyless = reg.registerSchema("ns", "keyless",
      """{"type":"record","name":"keyless","namespace":"ns","fields":[
         {"name":"v","type":"string"}]}""")
    val overridden = reg.registerSchema("ns", "overridden",
      """{"type":"record","name":"overridden","namespace":"ns","fields":[
         {"name":"id","type":"int","pkey":1}]}""")
    val ghost = reg.registerSchema("ns", "ghost",
      """{"type":"record","name":"ghost","namespace":"ns","fields":[
         {"name":"id","type":"int","pkey":1}]}""")

    // eligibility: only pkey topics qualify
    val eligible = CompactionSetter.topicsToCompact(reg)
    assert(eligible.toSet ==
      Set(keyed.topicName, overridden.topicName, ghost.topicName))
    assert(!eligible.contains(keyless.topicName))
    assert(CompactionSetter.topicsToCompact(reg, Some(keyed.topicName)) ==
      Seq(keyed.topicName))

    // cluster knows all but the ghost; one has a manual policy override
    val configs = scala.collection.mutable.Map(
      keyed.topicName -> Map.empty[String, String],
      keyless.topicName -> Map.empty[String, String],
      overridden.topicName -> Map("cleanup.policy" -> "delete"))
    val store = new CompactionSetter.TopicConfigStore {
      def getConfig(t: String): Option[Map[String, String]] = configs.get(t)
      def setConfig(t: String, c: Map[String, String]): Unit = configs(t) = c
    }
    val res = CompactionSetter.applyLogCompaction(store, eligible.sorted)
    assert(res.compacted == Seq(keyed.topicName))
    assert(res.skipped == Seq(overridden.topicName)) // manual override wins
    assert(res.missed == Seq(ghost.topicName))
    assert(configs(keyed.topicName)("cleanup.policy") == "compact")
    assert(configs(overridden.topicName)("cleanup.policy") == "delete")

    // dry run reports identically but writes nothing
    configs(keyed.topicName) = Map.empty
    val dry = CompactionSetter.applyLogCompaction(store, eligible.sorted, dryRun = true)
    assert(dry.compacted == Seq(keyed.topicName))
    assert(configs(keyed.topicName).isEmpty)
  }

  test("dialect sniffing recovers from misleading markers; zero-column parses count as failures") {
    import graft.tools.Bootstrapper
    // 'unsigned_delta' contains the substring but not the WORD unsigned:
    // routes to Redshift directly
    val rs = Bootstrapper.parseSqlDdl(
      "CREATE TABLE public.metrics (unsigned_delta INT8 NOT NULL)")
    assert(rs.columns.map(_.name) == Seq("unsigned_delta") &&
      rs.columns.head.avroType == "long")
    // a genuine MySQL marker (ENGINE=) but with a type only the
    // Redshift parser knows would fail MySQL — the fallback recovers
    val fb = Bootstrapper.parseSqlDdl(
      "CREATE TABLE m (a INT8 NOT NULL) ENGINE=InnoDB;")
    assert(fb.columns.map(_.name) == Seq("a"))
    // a parse that drops every column line must not "succeed" as an
    // empty schema
    intercept[IllegalArgumentException] {
      Bootstrapper.parseSqlDdl("CREATE TABLE t (KEY only_a_key (x))")
    }
  }

  test("redshift named CONSTRAINT pk parses directly and keeps ordinals") {
    import graft.tools.RedshiftDdlConverter
    // previously CONSTRAINT fell through to colRe (parsed as a column
    // named CONSTRAINT, threw) and the MySQL fallback registered the
    // table with NO pkey ordinals — silently breaking downstream CDC
    // keying
    val spec = RedshiftDdlConverter.parse(
      """CREATE TABLE public.t (
        |  a INT NOT NULL,
        |  b VARCHAR(16) NOT NULL,
        |  CONSTRAINT t_pk PRIMARY KEY (a, b),
        |  CONSTRAINT t_uq UNIQUE (b)
        |)""".stripMargin, strict = true)
    assert(spec.primaryKeys == Seq("a", "b"), s"got ${spec.primaryKeys}")
  }

  test("bootstrapper fallback cannot mask a lossy parse: strict mode surfaces the primary error") {
    import graft.tools.Bootstrapper
    // MySQL-marked DDL with one unsupported type: the MySQL parser
    // throws; the Redshift fallback cannot parse the backticked column
    // either — but LENIENTLY it would drop just that entry and
    // register a partial schema. Strict mode makes the fallback fail
    // too, and the informative PRIMARY error is the one that surfaces.
    val e = intercept[IllegalArgumentException] {
      Bootstrapper.parseSqlDdl(
        "CREATE TABLE t (id INT NOT NULL, `shape` GEOMETRY NOT NULL)")
    }
    assert(e.getMessage.contains("geometry"), e.getMessage)
  }

  test("tail limit is deterministic first-N in sequence order") {
    import spark.implicits._
    // many partitions, ids shuffled across them: a bare limit() would
    // return whichever rows arrive first
    val consumed = spark.range(0, 1000, 1, 16)
      .selectExpr("cast(id as int) as schema_id",
        "'create' as message_type", "cast(1700000000 + id as int) as timestamp")
    val got = (0 until 3).map { _ =>
      Tailer.tail(consumed, fields = Seq("schema_id", "timestamp"),
        messageLimit = Some(5)).collect().map(_.getInt(0)).toSeq
    }
    assert(got.forall(_ == Seq(0, 1, 2, 3, 4)),
      s"limit must take the FIRST five in timestamp order, got $got")
  }

  test("binlog analyzer carries header timestamps forward per file") {
    import spark.implicits._
    // two files: carry-forward must not leak across the partition key
    val lines = Seq(
      ("a", 1L, "SET TIMESTAMP=1700000000/*!*/;"),
      ("a", 2L, "#231114 22:13:20 server id 3  end_log_pos 99 CRC32 0xdead  Write_rows: table id 5 flags: STMT_END_F"),
      ("a", 3L, "### INSERT INTO db.users"),
      ("a", 4L, "### UPDATE db.users"),     // no new header: same timestamp
      ("a", 5L, "#231114 22:30:00 server id 3  end_log_pos 120 CRC32 0xbeef  Delete_rows: table id 5 flags: STMT_END_F"),
      ("a", 6L, "### DELETE FROM db.orders"),
      ("a", 7L, "# at 120"),                // noise lines don't emit or reset
      // mysqlbinlog prints hours with %2d: single-digit hours arrive
      // space-padded — a strict HH pattern nulled these (carrying the
      // previous header's timestamp) and died in ANSI mode
      ("a", 8L, "#231115  4:05:06 server id 3  end_log_pos 150 CRC32 0xfeed  Write_rows: table id 5 flags: STMT_END_F"),
      ("a", 9L, "### INSERT INTO db.morning"),
      ("b", 1L, "### INSERT INTO db.other") // file b has no header yet -> null ts
    ).toDF("file", "line_no", "line")
    val got = graft.tools.BinlogAnalyzer.parse(lines, "file", "line_no", "line")
      .select($"file", $"line_no", $"timestamp", $"statement_type", $"table_name")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getString(3), r.getString(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    val t1 = java.time.LocalDateTime.of(2023, 11, 14, 22, 13, 20)
      .toEpochSecond(java.time.ZoneOffset.UTC)
    val t2 = java.time.LocalDateTime.of(2023, 11, 14, 22, 30, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC)
    val t3 = java.time.LocalDateTime.of(2023, 11, 15, 4, 5, 6)
      .toEpochSecond(java.time.ZoneOffset.UTC)
    assert(got == Seq(
      ("a", 3L, t1, "insert", "db.users"),
      ("a", 4L, t1, "update", "db.users"),
      ("a", 6L, t2, "delete", "db.orders"),
      ("a", 9L, t3, "insert", "db.morning"),
      ("b", 1L, -1L, "insert", "db.other")))
  }
}
