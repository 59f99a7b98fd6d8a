package graft

import graft.schema.SchemaRegistry

/** Registry semantics: idempotent registration, compatible evolution stays
  * on-topic, incompatible change spawns a new topic, pkey extraction
  * (reference: schematizer.py:474-742, 1191-1242). */
class SchemaRegistrySpec extends SparkTestBase {

  private val base =
    """{"type":"record","name":"src","namespace":"g","fields":[
         {"name":"good_field","type":"int","default":1}]}"""
  private val compatible =
    """{"type":"record","name":"src","namespace":"g","fields":[
         {"name":"good_field","type":"int","default":1},
         {"name":"good_compatible_field","type":"int","default":1}]}"""
  private val incompatible =
    """{"type":"record","name":"src","namespace":"g","fields":[
         {"name":"good_field","type":"int","default":1},
         {"name":"breaking_field","type":"string"}]}"""
  private val withPkeys =
    """{"type":"record","name":"pk","namespace":"g","fields":[
         {"name":"field1","type":"int","pkey":2},
         {"name":"field2","type":"string","pkey":1},
         {"name":"field3","type":"int","pkey":3},
         {"name":"field4","type":"int"}]}"""

  test("re-registering the identical schema returns the same entry") {
    val reg = new SchemaRegistry
    val a = reg.registerSchema("ns", "src", base)
    val b = reg.registerSchema("ns", "src", base)
    assert(a.schemaId == b.schemaId)
    assert(reg.schemas.size == 1)
  }

  test("compatible evolution registers a new version on the same topic") {
    val reg = new SchemaRegistry
    val a = reg.registerSchema("ns", "src", base)
    val b = reg.registerSchema("ns", "src", compatible)
    assert(a.schemaId != b.schemaId)
    assert(a.topicName == b.topicName)
    assert(reg.getLatestSchemaByTopicName(a.topicName).get.schemaId == b.schemaId)
  }

  test("incompatible change spawns a new topic for the same source") {
    val reg = new SchemaRegistry
    val a = reg.registerSchema("ns", "src", base)
    val b = reg.registerSchema("ns", "src", incompatible)
    assert(a.topicName != b.topicName)
    assert(reg.topicsBySource("ns", "src").size == 2)
    assert(reg.getLatestTopicBySource("ns", "src").get.name == b.topicName)
  }

  test("primary keys extracted in pkey-ordinal order") {
    val reg = new SchemaRegistry
    val s = reg.registerSchema("ns", "pk", withPkeys)
    assert(s.primaryKeys == Seq("field2", "field1", "field3"))
    assert(reg.topicsWithPrimaryKeys.map(_.name).contains(s.topicName))
  }

  test("pii flag propagates to topics and the pii topic set") {
    val reg = new SchemaRegistry
    val s = reg.registerSchema("ns", "secret", base, containsPii = true)
    assert(reg.piiTopics == Set(s.topicName))
  }

  test("snapshot maps every schema id to its json") {
    val reg = new SchemaRegistry
    val a = reg.registerSchema("ns", "src", base)
    val b = reg.registerSchema("ns", "src", compatible)
    assert(reg.snapshot.keySet == Set(a.schemaId, b.schemaId))
  }

  test("catalog DataFrames expose topics and schemas") {
    val reg = new SchemaRegistry
    reg.registerSchema("ns", "src", base)
    reg.registerSchema("ns2", "other", compatible, containsPii = true)
    val t = reg.topicsDF(spark)
    val s = reg.schemasDF(spark)
    assert(t.count() == 2 && s.count() == 2)
    assert(t.filter(t("contains_pii")).count() == 1)
  }

  test("schema elements flatten record fields, excluding the whole-record element") {
    val reg = new SchemaRegistry
    val e = reg.registerSchema("ns", "src",
      """{"type":"record","name":"biz","namespace":"ns","fields":[
         {"name":"id","type":"int","doc":"pk"},
         {"name":"name","type":"string"},
         {"name":"tags","type":{"type":"array","items":"string"}}]}""")
    val els = reg.getSchemaElementsBySchemaId(e.schemaId)
    assert(els.map(_.elementName) == Seq("biz.id", "biz.name", "biz.tags"))
    assert(els.map(_.elementType) == Seq("int", "string", "array"))
    assert(els.head.doc.contains("pk"))
    // non-record schemas (e.g. the fixed(16) IV) have no field elements
    val iv = reg.registerSchema("graft.crypto", "iv",
      graft.core.Envelope.initializationVectorSchemaJson)
    assert(reg.getSchemaElementsBySchemaId(iv.schemaId).isEmpty)
  }

  test("created-after schema pagination walks keyset pages to the end") {
    val reg = new SchemaRegistry
    // 7 sources -> 7 schemas with distinct ids/ticks
    val entries = (1 to 7).map(i => reg.registerSchema("ns", s"s$i", base))
    val cutoffTick = entries(2).createdAt // entries 3..7 are at-or-after
    val got = reg.getSchemasCreatedAfterDate(cutoffTick, pageSize = 2)
    assert(got.map(_.schemaId) == entries.drop(2).map(_.schemaId))
    // single page form respects count and min_id
    val page = reg.getSchemasByCriteria(createdAfter = 0L,
      minId = entries(3).schemaId, count = 2)
    assert(page.map(_.schemaId) == entries.slice(3, 5).map(_.schemaId))
  }

  // --- round-4 source-catalog / schema_ref surface --------------------
  // (reference: tools/schema_ref.py:154, bootstrapper.py:107-272)

  test("sources are created implicitly with replay-deterministic ids and owner upsert") {
    val reg = new SchemaRegistry
    reg.registerSchema("ns", "first", base, sourceOwnerEmail = "alice@example.com")
    reg.registerSchema("ns", "second", base)
    reg.registerSchema("ns2", "third", base, sourceOwnerEmail = "bob@example.com")
    assert(reg.allSources.map(s => (s.sourceId, s.namespaceName, s.name)) ==
      Seq((1, "ns", "first"), (2, "ns", "second"), (3, "ns2", "third")))
    assert(reg.getSourceByName("ns", "first").get.ownerEmail == "alice@example.com")
    // re-registration with a new non-empty owner upserts; empty owner keeps it
    reg.registerSchema("ns", "first", compatible, sourceOwnerEmail = "carol@example.com")
    assert(reg.getSourceByName("ns", "first").get.ownerEmail == "carol@example.com")
    reg.registerSchema("ns", "first", base)
    assert(reg.getSourceByName("ns", "first").get.ownerEmail == "carol@example.com")
    // ids are stable across the upsert — no new source row appeared
    assert(reg.allSources.size == 3)
    assert(reg.sourcesByNamespace("ns").map(_.name) == Seq("first", "second"))
  }

  test("namespace ids come from their own dense sequence, not source ids") {
    val reg = new SchemaRegistry
    // two sources in ns_a before ns_b appears: source ids are 1,2 but
    // namespace ids must stay dense (reference numbering — ADVICE r4)
    reg.registerSchema("ns_a", "s1", base)
    reg.registerSchema("ns_a", "s2", base)
    reg.registerSchema("ns_b", "s3", base)
    assert(reg.namespaceId("ns_a").contains(1))
    assert(reg.namespaceId("ns_b").contains(2))
    assert(reg.namespaceId("missing").isEmpty)
  }

  test("cluster move forces a new topic even for an identical schema") {
    val reg = new SchemaRegistry
    val a = reg.registerSchema("ns", "src", base)
    val b = reg.registerSchema("ns", "src", base, clusterType = "scribe")
    assert(a.topicName != b.topicName)
    val byName = reg.topicsBySource("ns", "src").map(t => t.name -> t.clusterType).toMap
    assert(byName(a.topicName) == "datapipe" && byName(b.topicName) == "scribe")
    // moving back is another fork — the latest datapipe topic is gone
    val c = reg.registerSchema("ns", "src", base)
    assert(c.topicName != a.topicName && c.topicName != b.topicName)
  }

  test("categories, schema notes, field notes and file sources attach and validate") {
    val reg = new SchemaRegistry
    val e = reg.registerSchema("ns", "src", base, sourceOwnerEmail = "o@example.com")
    val srcId = reg.getSourceByName("ns", "src").get.sourceId
    reg.setSourceCategory(srcId, "billing")
    assert(reg.getSourceCategory(srcId).contains("billing"))
    reg.deleteSourceCategory(srcId)
    assert(reg.getSourceCategory(srcId).isEmpty)
    intercept[IllegalArgumentException](reg.setSourceCategory(999, "x"))

    reg.setSchemaNote(e.schemaId, "the note")
    assert(reg.getSchemaNote(e.schemaId).contains("the note"))
    intercept[IllegalArgumentException](reg.setSchemaNote(999, "x"))

    reg.setFieldNote(e.schemaId, "good_field", "field doc")
    assert(reg.getFieldNote(e.schemaId, "good_field").contains("field doc"))
    assert(reg.getFieldNotes(e.schemaId) == Map("good_field" -> "field doc"))
    intercept[IllegalArgumentException](reg.setFieldNote(e.schemaId, "no_such_field", "x"))

    reg.setFileSource(e.schemaId, "schema.avsc", "repo://schemas/src.avsc")
    assert(reg.getFileSource(e.schemaId).contains(("schema.avsc", "repo://schemas/src.avsc")))
    intercept[IllegalArgumentException](reg.setFileSource(999, "d", "u"))
  }

  test("sourcesDF exposes the source catalog with categories") {
    val reg = new SchemaRegistry
    reg.registerSchema("ns", "a", base, sourceOwnerEmail = "a@example.com")
    reg.registerSchema("ns", "b", base)
    reg.setSourceCategory(1, "core")
    val df = reg.sourcesDF(spark)
    assert(df.columns.toSeq ==
      Seq("source_id", "name", "namespace", "owner_email", "category", "created_at"))
    val rows = df.orderBy("source_id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(3), Option(r.getString(4))))
    assert(rows.toSeq == Seq(
      (1, "a", "a@example.com", Some("core")), (2, "b", "", None)))
  }

  test("topics-by-criteria filters conjunctively, paginates, and caps results") {
    val reg = new SchemaRegistry
    val inNs = (1 to 25).map(i => reg.registerSchema("ns", s"s$i", base))
    reg.registerSchema("other", "x", base)
    val all = reg.getTopicsByCriteria(namespace = Some("ns"))
    assert(all.size == 25) // crosses the 20-row internal page boundary
    assert(all.map(_.topicId) == all.map(_.topicId).sorted)
    val capped = reg.getTopicsByCriteria(namespace = Some("ns"), maxCount = Some(3))
    assert(capped.size == 3 && capped.map(_.topicId) == all.take(3).map(_.topicId))
    val bySource = reg.getTopicsByCriteria(namespace = Some("ns"), source = Some("s9"))
    assert(bySource.map(_.name) == Seq(inNs(8).topicName))
    val cutoff = reg.getTopicByName(inNs(20).topicName).get.createdAt
    val late = reg.getTopicsByCriteria(createdAfter = Some(cutoff))
    // inclusive bound: topics 21..25 of ns plus the later other/x topic
    assert(late.map(_.name).contains(inNs(20).topicName) && late.size == 6)
  }
}
