package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.core.Envelope
import graft.functions._
import graft.schema.SchemaRegistry

/** Envelope/payload serde exercised as oracle-checkable queries.
  *
  * The trick: a pack→unpack→decode round trip is the identity, so the
  * DuckDB oracle is a plain SELECT of the input columns — the serde gets a
  * hash-checked correctness gate even though Avro bytes themselves aren't
  * SQL-expressible (SURVEY §2.2 P1-P4, §2.9).
  */
object EnvelopeOps {

  /** Writer schema for the events demo payload. */
  val eventSchemaJson: String =
    """{"type":"record","name":"event","namespace":"graft.demo","fields":[
         {"name":"event_id","type":"long"},
         {"name":"user_id","type":"long"},
         {"name":"event_type","type":"string"},
         {"name":"value","type":"double"}]}"""

  /** Reader schema with an extra defaulted field — exercises Avro
    * reader/writer resolution inside the same gate. */
  val eventSchemaV2Json: String =
    """{"type":"record","name":"event","namespace":"graft.demo","fields":[
         {"name":"event_id","type":"long"},
         {"name":"user_id","type":"long"},
         {"name":"event_type","type":"string"},
         {"name":"value","type":"double"},
         {"name":"channel","type":"string","default":"unknown"}]}"""

  private def registryForEvents: (SchemaRegistry, Int, Int) = {
    val reg = new SchemaRegistry
    val v1 = reg.registerSchema("demo", "event", eventSchemaJson)
    val v2 = reg.registerSchema("demo", "event", eventSchemaV2Json)
    (reg, v1.schemaId, v2.schemaId)
  }

  private def packEvents(spark: SparkSession, dir: String, schemaId: Int,
                         ascii: Boolean): DataFrame = {
    import spark.implicits._
    val metaType = Envelope.sparkType("meta").dataType
    val env = struct(
      unhex(md5($"event_id".cast("string"))).as("uuid"),
      lit("create").as("message_type"),
      lit(schemaId).as("schema_id"),
      encode_payload(
        struct($"event_id", $"user_id", $"event_type", $"value"),
        eventSchemaJson).as("payload"),
      lit(null).cast("binary").as("previous_payload"),
      lit(null).cast(metaType).as("meta"),
      lit(null).cast("string").as("encryption_type"),
      unix_timestamp($"ts").cast("int").as("timestamp"))
    val packer = if (ascii) pack_envelope_ascii(env) else pack_envelope(env)
    Tables.events(spark, dir).select(packer.as("value"))
  }

  /** encode → pack(binary) → unpack → decode(v1 reader) ≡ identity. */
  def qEnvelopeRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (reg, v1, _) = registryForEvents
    packEvents(spark, dir, v1, ascii = false)
      .select(unpack_envelope($"value").as("env"))
      .select(decode_payload($"env.payload", $"env.schema_id", reg, v1).as("p"))
      .select($"p.event_id", $"p.user_id", $"p.event_type", $"p.value")
      .orderBy($"event_id")
  }

  /** ASCII/Scribe transport variant + schema-evolution read: v1-written
    * payloads decoded under the v2 reader schema (defaults filled). */
  def qEnvelopeEvolution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (reg, v1, v2) = registryForEvents
    packEvents(spark, dir, v1, ascii = true)
      .select(unpack_envelope($"value").as("env"))
      .select(decode_payload($"env.payload", $"env.schema_id", reg, v2).as("p"))
      .select($"p.event_id", $"p.user_id", $"p.event_type", $"p.value", $"p.channel")
      .orderBy($"event_id")
  }

  /** AES-CBC payload encryption round trip (SURVEY §2.2 P7 — reference
    * _encryption_helper.py:108-198) using Spark's builtin aes_encrypt /
    * aes_decrypt with a fixed key + IV (the IV rides as a meta attribute in
    * the real flow; fixed here so the query is deterministic).
    */
  def qEncryptRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        expr("aes_encrypt(text, '0123456789abcdef', 'CBC', 'PKCS', binary('fedcba9876543210'))")
          .as("ciphertext"),
        $"text")
      .select($"doc_id",
        expr("cast(aes_decrypt(ciphertext, '0123456789abcdef', 'CBC', 'PKCS') as string)")
          .as("decrypted"),
        $"text")
      .select($"doc_id", $"decrypted", ($"decrypted" === $"text").as("matches"))
      .orderBy($"doc_id")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "env_roundtrip" -> (qEnvelopeRoundtrip _),
    "env_evolution" -> (qEnvelopeEvolution _),
    "env_encrypt_roundtrip" -> (qEncryptRoundtrip _)
  )

  val oracles: Map[String, String] = Map(
    "env_roundtrip" ->
      """SELECT event_id, user_id, event_type, value FROM events ORDER BY event_id""",
    "env_evolution" ->
      """SELECT event_id, user_id, event_type, value,
                'unknown' AS channel
         FROM events ORDER BY event_id""",
    "env_encrypt_roundtrip" ->
      """SELECT doc_id, text AS decrypted, true AS matches
         FROM documents ORDER BY doc_id"""
  )
}
