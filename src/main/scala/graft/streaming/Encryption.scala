package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.Envelope
import graft.schema.SchemaRegistry

/** AES-CBC payload encryption with the IV carried as a meta attribute
  * (reference: _encryption_helper.py:108-198, initialization_vector.py,
  * message.py:465-468, 489-550).
  *
  * Spark's builtin `aes_encrypt(…, 'CBC', 'PKCS', iv)` (codegen'd) does the
  * crypto; the engine contributes the reference's key/IV/wire management:
  *
  *  - IVs are drawn **randomly per message** (CBC is only semantically
  *    secure with unpredictable IVs; a content- or uuid-derived IV leaks
  *    plaintext-prefix equality across re-encryptions);
  *  - the wire layout matches the reference: the payload carries **raw CBC
  *    blocks only** and the IV travels exclusively in the
  *    `initialization_vector` meta attribute — not Spark's default
  *    IV-prefixed ciphertext — so payloads interoperate both directions
  *    with reference-produced envelopes;
  *  - `encryption_type = "AES_MODE_CBC-<key_id>"` names the key for
  *    rotation; decrypt resolves the key from encryption_type and the IV
  *    from meta.
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

  /** Fresh unpredictable 16-byte IV per row from a per-partition CSPRNG
    * ([[graft.functions.SecureRandomBinary]]; reference parity:
    * initialization_vector.py:29 uses os.urandom). Not [[graft.functions.Uuid4Binary]]:
    * that rides XORShift, whose state is recoverable from a few published
    * IVs — an observer could then predict future IVs, breaking CBC's
    * unpredictable-IV requirement. A CSPRNG also never replays across
    * streaming micro-batches (self-seeded per partition initialization). */
  def randomIv(): Column = graft.functions.secure_random_binary(16)

  /** Encrypt `payloadCol` in place, adding `meta` (IV attribute) and
    * `encryption_type` columns. The ciphertext is raw CBC blocks — Spark's
    * IV prefix is stripped; the IV rides only in the meta attribute, as on
    * the reference wire.
    *
    * DataFrame-level on purpose: the random IV must be **materialized in
    * its own projection** before use. `uuid()` is nondeterministic, so a
    * single expression tree referencing it twice (once inside aes_encrypt,
    * once in the meta attribute) would draw two different IVs and produce
    * undecryptable output; separate projection steps over a nondeterministic
    * column are not collapsed by Catalyst, so here it evaluates exactly
    * once per row. Pass an explicit `iv` only for replayable tests. */
  def encryptDF(df: org.apache.spark.sql.DataFrame, payloadCol: String,
                key: String, keyId: Int, ivSchemaId: Int,
                iv: Column = randomIv()): org.apache.spark.sql.DataFrame = {
    val prefixed = call_function("aes_encrypt",
      col(payloadCol), lit(key), lit("CBC"), lit("PKCS"), col("__iv"))
    df.withColumn("__iv", iv)
      .withColumn("__ct", prefixed)
      .withColumn(payloadCol, col("__ct").substr(lit(17), length(col("__ct")) - 16))
      .withColumn("meta", array(struct(
        lit(ivSchemaId).as("schema_id"), col("__iv").as("payload"))))
      .withColumn("encryption_type", lit(EncryptionTypePrefix + keyId))
      .drop("__iv", "__ct")
  }

  /** Decrypt an encrypted envelope payload: IV from the meta attribute,
    * key chosen by the key id parsed from encryption_type. Rows with
    * unknown key ids (or unencrypted rows) pass through as null —
    * dead-letter, not task failure. */
  def decrypt(ciphertext: Column, encryptionType: Column, meta: Column,
              ivSchemaId: Int, keys: Map[Int, String]): Column = {
    val iv = ivFromMeta(meta, ivSchemaId)
    val keyId = regexp_extract(encryptionType,
      EncryptionTypePrefix.replace("-", "\\-") + "(\\d+)", 1).cast("int")
    keys.foldLeft(lit(null).cast("binary")) { case (acc, (id, key)) =>
      when(keyId === id && iv.isNotNull,
        call_function("aes_decrypt",
          concat(iv, ciphertext), lit(key), lit("CBC"), lit("PKCS")))
        .otherwise(acc)
    }
  }

  /** IV recorded in the meta attributes for the given schema id. */
  def ivFromMeta(meta: Column, ivSchemaId: Int): Column =
    element_at(filter(meta, m => m.getField("schema_id") === ivSchemaId), 1)
      .getField("payload")
}
