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
}
