package graft

import org.apache.spark.sql.functions._

import graft.schema.SchemaRegistry
import graft.streaming.Encryption

/** AES-CBC payload encryption with IV meta attributes
  * (reference: _encryption_helper.py semantics). */
class EncryptionSpec extends SparkTestBase {

  private val key = "0123456789abcdef" // 16-byte AES-128 key file analog

  test("encrypt/decrypt round-trips; IV rides as a meta attribute; wire is raw CBC blocks") {
    import spark.implicits._
    val reg = new SchemaRegistry
    val ivEntry = Encryption.registerIvSchema(reg)

    val df = Seq((1L, "private-row-data"), (2L, "more-secrets"))
      .toDF("id", "data")
      .withColumn("payload", $"data".cast("binary"))

    val enc = Encryption.encryptDF(df, "payload", key,
      keyId = 1, ivSchemaId = ivEntry.schemaId)

    val c0 = enc.orderBy($"id").head()
    // ciphertext is not the plaintext
    assert(!new String(c0.getAs[Array[Byte]]("payload"), "UTF-8").contains("private"))
    assert(c0.getAs[String]("encryption_type") == "AES_MODE_CBC-1")
    // reference wire layout: raw CBC blocks only — a 16-byte plaintext pads
    // to exactly 2 blocks (32 bytes), no IV prefix
    assert(c0.getAs[Array[Byte]]("payload").length == 32)

    // IV meta attribute: present, 16 bytes, tagged with the IV schema id
    val iv = Encryption.ivFromMeta($"meta", ivEntry.schemaId)
    assert(enc.select(length(iv)).head().getInt(0) == 16)

    // decrypt with the key from encryption_type and the IV from meta
    val dec = enc.select($"id",
      Encryption.decrypt($"payload", $"encryption_type", $"meta",
        ivEntry.schemaId, Map(1 -> key)).cast("string").as("data"))
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(dec.toSeq == Seq((1L, "private-row-data"), (2L, "more-secrets")))
  }

  test("IVs are random per message: same plaintext twice gives distinct ciphertexts") {
    import spark.implicits._
    val reg = new SchemaRegistry
    val ivEntry = Encryption.registerIvSchema(reg)
    val df = Seq((1L, "same-content"), (2L, "same-content"))
      .toDF("id", "data").withColumn("payload", $"data".cast("binary"))
    val enc = Encryption.encryptDF(df, "payload", key,
      keyId = 1, ivSchemaId = ivEntry.schemaId)
    val rows = enc.select(hex($"payload").as("c"),
      hex(Encryption.ivFromMeta($"meta", ivEntry.schemaId)).as("iv")).collect()
    assert(rows(0).getString(1) != rows(1).getString(1), "IVs must differ")
    assert(rows(0).getString(0) != rows(1).getString(0),
      "equal plaintexts must not produce equal ciphertexts under CBC")
  }

  test("unknown key id decrypts to null (dead-letter), not task failure") {
    import spark.implicits._
    val reg = new SchemaRegistry
    val ivEntry = Encryption.registerIvSchema(reg)
    val df = Seq((1L, "x")).toDF("id", "data")
      .withColumn("payload", $"data".cast("binary"))
    val enc = Encryption.encryptDF(df, "payload", key,
      keyId = 9, ivSchemaId = ivEntry.schemaId)
    val out = enc.select(
      Encryption.decrypt($"payload", $"encryption_type", $"meta",
        ivEntry.schemaId, Map(1 -> key)).as("d"))
      .head()
    assert(out.isNullAt(0))
  }
}
