package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.Envelope
import graft.functions._
import graft.schema.SchemaRegistry

/** AES-CBC payload encryption with the IV carried as a meta attribute
  * (reference: _encryption_helper.py:108-198, initialization_vector.py,
  * message.py:465-468, 489-550).
  *
  * Spark's builtin `aes_encrypt(…, 'CBC', 'PKCS', iv)` (codegen'd) does the
  * crypto; the engine contributes the reference's key/IV management: a
  * per-message IV derived deterministically from the message uuid, an
  * `initialization_vector` schema registered in the registry, the IV
  * published as a meta attribute alongside the payload, and
  * `encryption_type = "AES_MODE_CBC-<key_id>"` for key rotation. Decrypt
  * resolves the key id from encryption_type and the IV from meta.
  *
  * Key material arrives as a driver-provided map (the `key-N.key` file
  * analog); it is closure-captured, never logged, never a column.
  */
object Encryption {

  val EncryptionTypePrefix = "AES_MODE_CBC-"

  /** Register the IV meta-attribute schema (fixed 16). */
  def registerIvSchema(registry: SchemaRegistry): registry.SchemaEntry =
    registry.registerSchema("graft.crypto", "initialization_vector",
      Envelope.initializationVectorSchemaJson)

  /** Deterministic per-message 16-byte IV from the message uuid (the
    * reference draws random IVs; uuid-derived keeps queries replayable and
    * is equally unique per message). */
  def ivFor(uuid: Column): Column = unhex(md5(hex(uuid)))

  /** Encrypt payload bytes; returns (ciphertext, meta attribute, type). */
  def encrypt(payload: Column, uuid: Column, key: String, keyId: Int,
              ivSchemaId: Int): (Column, Column, Column) = {
    val iv = ivFor(uuid)
    val ciphertext = call_function("aes_encrypt",
      payload, lit(key), lit("CBC"), lit("PKCS"), iv)
    val metaAttr = array(struct(
      lit(ivSchemaId).as("schema_id"), iv.as("payload")))
    (ciphertext, metaAttr, lit(EncryptionTypePrefix + keyId))
  }

  /** Decrypt an encrypted envelope payload. The key is chosen by the
    * key id parsed from encryption_type; rows with other key ids (or
    * unencrypted rows) pass through as null — filter upstream. */
  def decrypt(ciphertext: Column, encryptionType: Column,
              keys: Map[Int, String]): Column = {
    val keyId = regexp_extract(encryptionType,
      EncryptionTypePrefix.replace("-", "\\-") + "(\\d+)", 1).cast("int")
    keys.foldLeft(lit(null).cast("binary")) { case (acc, (id, key)) =>
      when(keyId === id,
        call_function("aes_decrypt", ciphertext, lit(key), lit("CBC"), lit("PKCS")))
        .otherwise(acc)
    }
  }

  /** IV recorded in the meta attributes for the given schema id (audit /
    * cross-system decrypt that can't use the prefix convention). */
  def ivFromMeta(meta: Column, ivSchemaId: Int): Column =
    element_at(filter(meta, m => m.getField("schema_id") === ivSchemaId), 1)
      .getField("payload")
}
