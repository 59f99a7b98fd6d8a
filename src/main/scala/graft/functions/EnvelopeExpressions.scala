package graft.functions

import org.apache.avro.generic.GenericRecord
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

import graft.core.Envelope
import graft.schema.AvroConversions

/** Catalyst expressions for the envelope/payload serde — the engine's one
  * genuinely custom serde problem (SURVEY §2.9, §7.3): Spark's `from_avro`
  * takes a static schema per column, but pipeline payloads carry a
  * per-message writer `schema_id` resolved against the registry
  * (reference: data_pipeline/_avro_payload.py:136-167).
  *
  * All expressions are deterministic and per-JVM cache-backed (AvroCodec).
  * Each implements `doGenCode` as one reference-object call into the same
  * method its interpreted path runs: the avro codec itself can't be
  * codegen'd, but this keeps the CHILD subtree (struct construction,
  * field extraction — interpreted per row under the old CodegenFallback,
  * which routes the whole subtree through `eval(row)`) inside whole-stage
  * codegen, and skips the per-row InternalRow materialization the
  * fallback needed.
  */

/** Envelope struct → framed transport bytes
  * (reference: envelope.py:73-101 pack; 'a'+base64 ASCII variant). */
case class PackEnvelope(child: Expression, ascii: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  // nullable beyond the child: a required-field-null row PACKS TO NULL
  // (the producer-side dead-letter contract) even when the struct itself
  // is non-null
  override def nullable: Boolean = true
  override def prettyName: String = "pack_envelope"

  // analysis-time shape check: pack() reads the child row POSITIONALLY
  // against Envelope.sparkType, so the check is STRUCTURAL (types by
  // position, names irrelevant — legitimate callers build unaliased
  // structs). A wrong-shaped or type-transposed struct previously threw
  // ClassCastException per row deep in a job; same-type transpositions
  // remain undetectable, which is inherent to positional semantics.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (org.apache.spark.sql.types.DataType.equalsStructurally(
        child.dataType, Envelope.sparkType, ignoreNullability = true))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"pack_envelope expects the envelope struct ${Envelope.sparkType.sql}, " +
        s"got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = pack(input.asInstanceOf[InternalRow])

  // ordinals of the envelope fields the Avro schema requires non-null —
  // derived from the ONE schema definition, never hand-listed
  @transient private lazy val requiredOrdinals: Array[Int] =
    Envelope.sparkType.fields.zipWithIndex
      .collect { case (f, i) if !f.nullable => i }

  // A null in a REQUIRED field (a source row with no timestamp, a null
  // event_type reaching the payload) cannot serialize: the Avro writer
  // threw NullPointerException PER ROW deep in the job — at corpus
  // scale one corrupt source row killed the whole producer pass after
  // retries. Mirror [[UnpackEnvelope]]'s dead-letter contract instead:
  // the unpackable row packs to NULL, which the caller can count,
  // filter, or route — the job survives. The ordinal scan is the cheap
  // fast path for the common top-level case; the catch makes the
  // contract TOTAL — a null nested INSIDE a required complex field (a
  // null meta array element, containsNull=false) passes the top-level
  // scan yet still cannot serialize, and without the catch it threw the
  // very per-row NPE the contract claims to eliminate. Symmetric with
  // unpack/decode's NonFatal dead-letter on the consume side.
  def pack(row: InternalRow): Array[Byte] = {
    var i = 0
    while (i < requiredOrdinals.length) {
      if (row.isNullAt(requiredOrdinals(i))) return null
      i += 1
    }
    // the catch is NARROW by design: the writer's null-DATA NPE
    // ("null value for (non-nullable) T at path", gated by
    // AvroCodec.isNullDataNpe) and UnresolvedUnionException are what the
    // Avro writer throws for null DATA in required positions — per-row,
    // dead-letterable. Everything else — a deterministic config error
    // (type-transposed struct → ClassCastException, wrong shape →
    // AvroTypeException) or a transient NPE under load — must still
    // fail the job LOUDLY: a blanket catch would encode a mis-configured
    // corpus to 100% nulls, and absorbing a transient fault presents
    // lost data as "dead-lettered rows" (the r14 flake class).
    try {
      val record = AvroConversions
        .toAvro(row, Envelope.sparkType, envelopeSchema)
        .asInstanceOf[GenericRecord]
      val avroBytes = AvroCodec.encode(record, envelopeSchema)
      if (ascii) AvroCodec.frameAscii(avroBytes) else AvroCodec.frameBinary(avroBytes)
    } catch {
      case e: NullPointerException if AvroCodec.isNullDataNpe(e) => null
      case _: org.apache.avro.UnresolvedUnionException => null
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("packEnvelope", this, classOf[PackEnvelope].getName)
    // propagate pack()'s dead-letter null: without the isNull flip the
    // generated code would hand downstream a null VALUE flagged non-null
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |${ev.value} = $ref.pack($v);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)
  }

  @transient private lazy val envelopeSchema = AvroCodec.parse(Envelope.avroSchemaJson)

  override protected def withNewChildInternal(newChild: Expression): PackEnvelope =
    copy(child = newChild)
}

/** Framed transport bytes → envelope struct; auto-detects binary vs ASCII
  * transport from the magic byte (reference: envelope.py:103-121). */
case class UnpackEnvelope(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = Envelope.sparkType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "unpack_envelope"

  override def nullSafeEval(input: Any): Any = unpack(input.asInstanceOf[Array[Byte]])

  // Corrupt transport bytes (bad magic byte, truncated/garbage Avro)
  // yield a NULL envelope — the dead-letter contract: at corpus scale a
  // single poisoned message must route to the dead-letter split, never
  // kill the task after retries.
  def unpack(framed: Array[Byte]): InternalRow =
    try {
      val avroBytes = AvroCodec.unframe(framed)
      val record = AvroCodec.decode(avroBytes, envelopeSchema, envelopeSchema)
      AvroConversions.toCatalyst(record, envelopeSchema).asInstanceOf[InternalRow]
    } catch { case scala.util.control.NonFatal(_) => null }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unpackEnvelope", this, classOf[UnpackEnvelope].getName)
    nullSafeCodeGen(ctx, ev, v => {
      val res = ctx.freshName("unpacked")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $res = $ref.unpack($v);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res;
         |}
       """.stripMargin
    })
  }

  @transient private lazy val envelopeSchema = AvroCodec.parse(Envelope.avroSchemaJson)

  override protected def withNewChildInternal(newChild: Expression): UnpackEnvelope =
    copy(child = newChild)
}

/** Payload struct → Avro bytes under a fixed writer schema
  * (reference: _avro_payload.py:144-149 encode side). */
case class EncodePayload(child: Expression, schemaJson: String)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  // nullable beyond the child: a row null in a field the WRITER SCHEMA
  // requires encodes to NULL (the producer-side dead-letter contract of
  // [[PackEnvelope]]) instead of the per-row Avro NullPointerException
  // that killed the task
  override def nullable: Boolean = true
  override def prettyName: String = "encode_payload"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StructType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"encode_payload expects a struct column, got $other")
    }

  override def nullSafeEval(input: Any): Any = encode(input.asInstanceOf[InternalRow])

  // ordinals the writer schema requires non-null (no null branch in the
  // field's union) — derived from the schema, never hand-listed
  @transient private lazy val requiredOrdinals: Array[Int] = {
    import scala.jdk.CollectionConverters._
    schema.getFields.asScala.zipWithIndex.collect {
      case (f, i) if !(f.schema().getType == org.apache.avro.Schema.Type.UNION &&
          f.schema().getTypes.asScala
            .exists(_.getType == org.apache.avro.Schema.Type.NULL)) => i
    }.toArray
  }

  // same totality catch as [[PackEnvelope.pack]]: the ordinal scan only
  // sees TOP-LEVEL writer-required nulls; a null nested inside a
  // required complex field (array element, nested record field) still
  // reached the Avro writer's per-row NPE — dead-letter those too.
  // Narrow like pack(): only the writer's null-DATA signals (the
  // isNullDataNpe-gated NPE, unresolved union) dead-letter; a
  // deterministic schema/struct mismatch — or a transient NPE from any
  // other cause — fails loudly instead of nulling rows silently.
  def encode(row: InternalRow): Array[Byte] = {
    var i = 0
    while (i < requiredOrdinals.length) {
      if (row.isNullAt(requiredOrdinals(i))) return null
      i += 1
    }
    try {
      val record = AvroConversions
        .toAvro(row, child.dataType.asInstanceOf[StructType], schema)
        .asInstanceOf[GenericRecord]
      AvroCodec.encode(record, schema)
    } catch {
      case e: NullPointerException if AvroCodec.isNullDataNpe(e) => null
      case _: org.apache.avro.UnresolvedUnionException => null
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("encodePayload", this, classOf[EncodePayload].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |${ev.value} = $ref.encode($v);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)
  }

  @transient private lazy val schema = AvroCodec.parse(schemaJson)

  override protected def withNewChildInternal(newChild: Expression): EncodePayload =
    copy(child = newChild)
}

/** (payload bytes, writer schema_id) → payload struct under a fixed reader
  * schema, with per-message writer-schema dispatch against a registry
  * snapshot — Avro reader/writer resolution exactly as the reference's
  * consumer decode (reference: _avro_payload.py:156-167,
  * base_consumer.py:291-313 reader-schema forcing).
  *
  * `registrySnapshot` rides with the serialized expression to every
  * executor; schemas parse once per JVM (AvroCodec cache). Unknown
  * schema_ids yield null (dead-letter filterable) rather than failing the
  * task — at 100 TB a single poisoned message must not kill the job.
  */
case class DecodePayload(
    payload: Expression,
    schemaId: Expression,
    registrySnapshot: Map[Int, String],
    readerSchemaId: Int)
    extends BinaryExpression {

  override def left: Expression = payload
  override def right: Expression = schemaId
  override def prettyName: String = "decode_payload"
  override def nullable: Boolean = true

  // analysis-time check: schema_id columns are often modeled BIGINT —
  // without this the cast in eval threw ClassCastException per row (and
  // the generated code failed Janino compilation) deep inside a job
  // instead of a clear error at plan time
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (payload.dataType, schemaId.dataType) match {
      case (org.apache.spark.sql.types.BinaryType,
            org.apache.spark.sql.types.IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (p, s) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"decode_payload expects (BINARY, INT), got (${p.sql}, ${s.sql}) — " +
            "cast a bigint schema_id to int first")
    }

  private val readerJson: String = registrySnapshot.getOrElse(readerSchemaId,
    throw new IllegalArgumentException(s"reader schema id $readerSchemaId not in registry snapshot"))

  override val dataType: DataType =
    AvroConversions.toStructType(AvroCodec.parse(readerJson))

  override def nullSafeEval(payloadBytes: Any, writerId: Any): Any =
    decode(payloadBytes.asInstanceOf[Array[Byte]], writerId.asInstanceOf[Int])

  // returns null for unknown writer ids AND for corrupt payload bytes
  // (truncated/garbage Avro, or ciphertext that skipped decryption) —
  // the dead-letter contract both ways
  def decode(payloadBytes: Array[Byte], writerId: Int): InternalRow = {
    val writerSchema = writerSchemaById.get(writerId).orNull
    if (writerSchema == null) null
    else try {
      val record = AvroCodec.decode(payloadBytes, writerSchema, readerSchema)
      AvroConversions.toCatalyst(record, readerSchema).asInstanceOf[InternalRow]
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("decodePayload", this, classOf[DecodePayload].getName)
    nullSafeCodeGen(ctx, ev, (p, id) => {
      val res = ctx.freshName("decoded")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $res = $ref.decode($p, $id);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res;
         |}
       """.stripMargin
    })
  }

  @transient private lazy val readerSchema = AvroCodec.parse(readerJson)
  // parsed once per executor: per-row json parsing/hashing is the serde
  // hot-path killer (schema json is O(KB))
  @transient private lazy val writerSchemaById: Map[Int, org.apache.avro.Schema] =
    registrySnapshot.map { case (id, json) => id -> AvroCodec.parse(json) }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecodePayload =
    copy(payload = newLeft, schemaId = newRight)
}
