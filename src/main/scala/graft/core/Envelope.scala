package graft.core

import org.apache.spark.sql.types._

/** The versioned wire envelope every pipeline message travels in.
  *
  * Field-for-field the reference's envelope v1 record
  * (reference: data_pipeline/schemas/envelope_v1.avsc,
  * data_pipeline/envelope.py:29-121): a flat Avro record preceded by a
  * magic byte — 0x00 for binary transport, ASCII 'a' for the
  * base64-encoded Scribe/clog variant.
  */
object Envelope {

  val MagicByteBinary: Byte = 0x00
  val MagicByteAscii: Byte = 'a'.toByte

  /** unix-seconds → the envelope's Avro `int` timestamp, NULL when the
    * value falls outside the int range (the envelope schema is
    * Y2038-bounded by construction — reference envelope_v1.avsc types
    * `timestamp` as plain `int`). The NULL flows into the required
    * ordinal and the row DEAD-LETTERS via pack_envelope's contract.
    * Without this guard the bare `.cast("int")` threw CAST_OVERFLOW
    * under ANSI for a single post-2038/pre-1902 source timestamp and
    * killed the whole producer pass — the exact job-killing class the
    * dead-letter contract exists to eliminate (found by the r13
    * hostile-events wave with a year-2200 row). */
  def timestampInt(unixSeconds: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.when(
      unixSeconds.between(Int.MinValue.toLong, Int.MaxValue.toLong),
      unixSeconds.cast("int"))

  /** Avro schema of the envelope record (authored from the documented field
    * list in SURVEY.md §1.2; envelope.py packs/unpacks exactly these eight
    * fields).
    */
  val avroSchemaJson: String =
    """{
      "type": "record",
      "name": "message_envelope",
      "namespace": "graft.envelope_v1",
      "doc": "Pipeline message envelope: versioned wrapper around a schema-registry encoded payload.",
      "fields": [
        {"name": "uuid", "type": {"type": "fixed", "name": "msg_uuid", "size": 16},
         "doc": "16-byte message uuid"},
        {"name": "message_type",
         "type": {"type": "enum", "name": "msg_type",
                  "symbols": ["create", "update", "delete", "refresh",
                              "heartbeat", "monitor", "registration", "log"]},
         "doc": "CDC message taxonomy; symbol order matches the reference envelope_v1.avsc exactly — Avro enums encode the symbol index, so order IS the wire format"},
        {"name": "schema_id", "type": "int", "doc": "registry id of the payload writer schema"},
        {"name": "payload", "type": "bytes", "doc": "Avro-encoded payload (possibly encrypted)"},
        {"name": "previous_payload", "type": ["null", "bytes"], "default": null,
         "doc": "pre-update row image; update messages only"},
        {"name": "meta", "type": ["null", {"type": "array", "items":
           {"type": "record", "name": "meta_attribute", "fields": [
             {"name": "schema_id", "type": "int"},
             {"name": "payload", "type": "bytes"}]}}], "default": null,
         "doc": "nested schema_id+payload attribute pairs"},
        {"name": "encryption_type", "type": ["null", "string"], "default": null,
         "doc": "e.g. AES_MODE_CBC-1"},
        {"name": "timestamp", "type": "int", "doc": "unix seconds"}
      ]
    }"""

  /** Spark-side shape of an unpacked envelope. */
  val sparkType: StructType = StructType(Seq(
    StructField("uuid", BinaryType, nullable = false),
    StructField("message_type", StringType, nullable = false),
    StructField("schema_id", IntegerType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("previous_payload", BinaryType, nullable = true),
    StructField("meta", ArrayType(StructType(Seq(
      StructField("schema_id", IntegerType, nullable = false),
      StructField("payload", BinaryType, nullable = false))), containsNull = false),
      nullable = true),
    StructField("encryption_type", StringType, nullable = true),
    StructField("timestamp", IntegerType, nullable = false)))

  /** PII initialization vector: fixed(16)
    * (reference: schemas/initialization_vector_v1.avsc). */
  val initializationVectorSchemaJson: String =
    """{"type": "fixed", "name": "initialization_vector", "namespace": "graft.crypto", "size": 16}"""

  /** Built-in registration heartbeat payload
    * (reference: schemas/registration_message_v1.avsc). */
  val registrationMessageSchemaJson: String =
    """{
      "type": "record", "name": "registration_message", "namespace": "graft.internal",
      "fields": [
        {"name": "team_name", "type": "string"},
        {"name": "client_name", "type": "string"},
        {"name": "client_type", "type": {"type": "enum", "name": "client_type",
                                         "symbols": ["producer", "consumer"]}},
        {"name": "timestamp", "type": ["null", {"type": "long", "logicalType": "timestamp-millis"}],
         "default": null},
        {"name": "expected_frequency_seconds", "type": "int"},
        {"name": "schema_id", "type": "int"}
      ]
    }"""

  /** Built-in monitoring window payload
    * (reference: schemas/monitoring_message_v1.avsc; aggregation semantics
    * client.py:217-324). */
  val monitoringMessageSchemaJson: String =
    """{
      "type": "record", "name": "monitoring_message", "namespace": "graft.internal",
      "fields": [
        {"name": "topic", "type": "string"},
        {"name": "client_name", "type": "string"},
        {"name": "client_type", "type": "string"},
        {"name": "message_count", "type": "int"},
        {"name": "start_timestamp", "type": "int"},
        {"name": "host_info", "type": "string"}
      ]
    }"""
}
