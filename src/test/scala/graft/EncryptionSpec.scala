package graft

import org.apache.spark.sql.functions._

import graft.schema.SchemaRegistry
import graft.streaming.Encryption

/** AES-CBC payload encryption with IV meta attributes
  * (reference: _encryption_helper.py semantics). */
class EncryptionSpec extends SparkTestBase {

  private val key = "0123456789abcdef" // 16-byte AES-128 key file analog

  test("encrypt/decrypt round-trips and IV rides as a meta attribute") {
    import spark.implicits._
    val reg = new SchemaRegistry
    val ivEntry = Encryption.registerIvSchema(reg)

    val df = Seq((1L, "private-row-data"), (2L, "more-secrets"))
      .toDF("id", "data")
      .withColumn("uuid", unhex(md5($"id".cast("string"))))
      .withColumn("payload", $"data".cast("binary"))

    val (ciphertext, metaAttr, encType) =
      Encryption.encrypt($"payload", $"uuid", key, keyId = 1, ivSchemaId = ivEntry.schemaId)
    val enc = df.select($"id", $"uuid", ciphertext.as("payload"),
      metaAttr.as("meta"), encType.as("encryption_type"))

    // ciphertext is not the plaintext
    val c0 = enc.orderBy($"id").head()
    assert(!new String(c0.getAs[Array[Byte]]("payload"), "UTF-8").contains("private"))
    assert(c0.getString(4) == "AES_MODE_CBC-1")

    // IV meta attribute: present, 16 bytes, tagged with the IV schema id
    val iv = Encryption.ivFromMeta($"meta", ivEntry.schemaId)
    assert(enc.select(length(iv)).head().getInt(0) == 16)

    // decrypt with the key resolved from encryption_type
    val dec = enc.select($"id",
      Encryption.decrypt($"payload", $"encryption_type", Map(1 -> key)).cast("string").as("data"))
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(dec.toSeq == Seq((1L, "private-row-data"), (2L, "more-secrets")))
  }

  test("unknown key id decrypts to null (dead-letter), not task failure") {
    import spark.implicits._
    val reg = new SchemaRegistry
    val ivEntry = Encryption.registerIvSchema(reg)
    val df = Seq((1L, "x")).toDF("id", "data")
      .withColumn("uuid", unhex(md5($"id".cast("string"))))
      .withColumn("payload", $"data".cast("binary"))
    val (ct, _, encType) =
      Encryption.encrypt($"payload", $"uuid", key, keyId = 9, ivSchemaId = ivEntry.schemaId)
    val out = df.select(
      Encryption.decrypt(ct, encType, Map(1 -> key)).as("d")).head()
    assert(out.isNullAt(0))
  }
}
