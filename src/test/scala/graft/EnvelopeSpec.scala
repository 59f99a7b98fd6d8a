package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Envelope
import graft.functions._

/** Envelope pack/unpack round trips (reference behavior:
  * envelope.py:73-121 incl. the 'a'+base64 ASCII transport). */
class EnvelopeSpec extends SparkTestBase {

  private def envelopeDF = {
    val rows = (0 until 50).map { i =>
      Row(
        Array.tabulate[Byte](16)(b => ((i + b) % 127).toByte),
        if (i % 4 == 0) "update" else "create",
        i % 7,
        Array[Byte](1, 2, 3, i.toByte),
        if (i % 4 == 0) Array[Byte](9, 9, i.toByte) else null,
        if (i % 3 == 0) Seq(Row(i % 7, Array[Byte](5, i.toByte))) else null,
        if (i % 5 == 0) "AES_MODE_CBC-1" else null,
        1700000000 + i)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Envelope.sparkType)
  }

  /** Row.toString prints Array[Byte] by identity — canonicalize to hex. */
  private def canon(v: Any): String = v match {
    case b: Array[Byte] => b.map(x => f"$x%02x").mkString
    case r: Row => r.toSeq.map(canon).mkString("(", ",", ")")
    case s: scala.collection.Seq[_] => s.map(canon).mkString("[", ",", "]")
    case other => String.valueOf(other)
  }

  private def roundTrip(ascii: Boolean): Unit = {
    val packed =
      if (ascii) envelopeDF.select(pack_envelope_ascii(struct(col("*"))).as("value"))
      else envelopeDF.select(pack_envelope(struct(col("*"))).as("value"))
    val unpacked = packed.select(unpack_envelope(col("value")).as("env")).select("env.*")
    val before = envelopeDF.collect().map(canon).sorted
    val after = unpacked.collect().map(canon).sorted
    assert(after.toSeq == before.toSeq)
  }

  test("binary transport round trip preserves every envelope field") {
    roundTrip(ascii = false)
  }

  test("ASCII transport round trip preserves every envelope field") {
    roundTrip(ascii = true)
  }

  test("binary frames start with 0x00, ASCII frames with 'a'") {
    val b = envelopeDF.select(pack_envelope(struct(col("*"))).as("v")).head().getAs[Array[Byte]](0)
    val a = envelopeDF.select(pack_envelope_ascii(struct(col("*"))).as("v")).head().getAs[Array[Byte]](0)
    assert(b(0) == 0x00)
    assert(a(0) == 'a'.toByte)
    // ASCII frames must be pure printable ASCII after the magic byte
    assert(a.drop(1).forall(c => c >= 32 && c < 127))
  }

  test("pack/encode dead-letter a null REQUIRED field to null, never a task-killing NPE") {
    // one source row with no timestamp previously threw a per-row
    // NullPointerException inside the Avro writer and killed the whole
    // producer job after retries — the mirror of unpack's corrupt-bytes
    // contract: an unserializable row packs to NULL (countable,
    // filterable, dead-letter routable)
    val rows = Seq(
      Row(Array.fill[Byte](16)(1), "create", 1, Array[Byte](1), null, null,
        null, null),                                     // null timestamp
      Row(null, "create", 1, Array[Byte](1), null, null, null, 1700000000),
      // null uuid
      Row(Array.fill[Byte](16)(2), "create", 2, Array[Byte](2), null, null,
        null, 1700000001))                               // fully valid
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      org.apache.spark.sql.types.StructType(Envelope.sparkType.fields
        .map(_.copy(nullable = true))))
    val packed = df.select(pack_envelope(struct(col("*"))).as("v")).collect()
    assert(packed.count(_.isNullAt(0)) == 2 && packed.count(!_.isNullAt(0)) == 1,
      "required-field-null rows must pack to null; valid rows must pack")
    // encode_payload: required-ness comes from the WRITER SCHEMA (no
    // null branch in the field's union) — a null required string
    // dead-letters, a null in a nullable union field still encodes
    val schema =
      """{"type":"record","name":"p","namespace":"g","fields":[
           {"name":"a","type":"long"},
           {"name":"b","type":["null","string"],"default":null}]}"""
    import spark.implicits._
    val enc = Seq((Some(1L), Some("x")), (None, Some("y")), (Some(3L), None))
      .toDF("a", "b")
      .select(encode_payload(struct($"a", $"b"), schema).as("v")).collect()
    assert(enc(0).isNullAt(0) == false && enc(1).isNullAt(0) == true &&
      enc(2).isNullAt(0) == false,
      "null required field -> null; null OPTIONAL field still encodes")
  }

  test("dead-letter is TOTAL: a null nested INSIDE a required complex field packs/encodes to null") {
    // the top-level required-ordinal scan cannot see these — a null meta
    // ELEMENT (containsNull=false in the envelope type) or a null element
    // of a required array in the writer schema previously reached the
    // Avro writer and threw the per-row NPE the contract claims to
    // eliminate (r12 ADVICE)
    val rows = Seq(
      Row(Array.fill[Byte](16)(1), "create", 1, Array[Byte](1), null,
        Seq(null), null, 1700000000),                 // null meta ELEMENT
      Row(Array.fill[Byte](16)(2), "create", 2, Array[Byte](2), null,
        Seq(Row(7, Array[Byte](9))), null, 1700000001)) // valid meta
    val metaNullable = org.apache.spark.sql.types.StructType(
      Envelope.sparkType.fields.map {
        case f if f.name == "meta" =>
          f.copy(dataType = org.apache.spark.sql.types.ArrayType(
            f.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
              .elementType, containsNull = true))
        case f => f.copy(nullable = true)
      })
    val packed = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), metaNullable)
      .select(pack_envelope(struct(col("*"))).as("v")).collect()
      .sortBy(_.isNullAt(0))
    assert(!packed(0).isNullAt(0) && packed(1).isNullAt(0),
      "null nested meta element must dead-letter to null, valid row must pack")
    // encode side: required array of long with a null element
    val schema =
      """{"type":"record","name":"n","namespace":"g","fields":[
           {"name":"xs","type":{"type":"array","items":"long"}}]}"""
    import spark.implicits._
    val enc = Seq(Seq[java.lang.Long](1L, null), Seq[java.lang.Long](2L, 3L))
      .toDF("xs")
      .select(encode_payload(struct($"xs"), schema).as("v")).collect()
      .sortBy(_.isNullAt(0))
    assert(!enc(0).isNullAt(0) && enc(1).isNullAt(0),
      "null element of a writer-required array must dead-letter to null")
  }

  test("a deterministic schema/struct mismatch fails loudly — dead-letter is for null DATA only") {
    // the catch in pack/encode is narrowed to the Avro writer's
    // null-data signals: a struct whose TYPE does not match the writer
    // schema is a config bug that must fail on row one, not encode an
    // entire corpus to 100% nulls presented as "dead-lettered rows"
    val schema =
      """{"type":"record","name":"m","namespace":"g","fields":[
           {"name":"a","type":"long"}]}"""
    import spark.implicits._
    val bad = Seq("not-a-long").toDF("a")
    val thrown = intercept[Exception] {
      bad.select(encode_payload(struct($"a"), schema).as("v")).collect()
    }
    assert(thrown != null)
  }

  test("unpack dead-letters corrupt bytes: unknown magic and truncated envelopes null, never kill the task") {
    // the dead-letter contract: at corpus scale one poisoned message must
    // route to the dead-letter split, not fail the job after retries
    val bad = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(Array[Byte](0x7f, 1, 2)),          // unknown magic byte
        Row(Array[Byte](1)),                   // truncated after the magic
        Row(Array.fill[Byte](8)(0x33)))),      // garbage avro body
      StructType(Seq(StructField("value", BinaryType))))
    val out = bad.select(unpack_envelope(col("value")).as("env")).collect()
    assert(out.length == 3 && out.forall(_.isNullAt(0)),
      s"corrupt transport bytes must unpack to null, got ${out.toSeq}")
  }
}
