package graft.schema

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.generic.{GenericData, GenericFixed, GenericRecord, GenericRecordBuilder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro ⇄ Catalyst conversion for registry-resolved payload schemas.
  *
  * Spark's own `from_avro` is static-schema; the pipeline's payloads are
  * dynamic per message (schema_id dispatch — reference:
  * data_pipeline/_avro_payload.py:136-167), so the decode expressions carry
  * their own conversion layer. Supports the Avro surface the reference
  * exercises (SURVEY §1.3): primitives, nullable unions, enum, fixed,
  * nested records, arrays, maps, plus timestamp-millis/micros and decimal
  * logical types.
  */
object AvroConversions {

  /** Avro schema → Spark type. Unions must be [null, T] or [T, null]
    * (the only shape the reference produces). */
  def toSparkType(schema: Schema): (DataType, Boolean) = schema.getType match {
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      schema.getLogicalType match {
        case _: LogicalTypes.Date => (DateType, false)
        case _ => (IntegerType, false)
      }
    case Schema.Type.LONG =>
      schema.getLogicalType match {
        case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros => (TimestampType, false)
        case _ => (LongType, false)
      }
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      schema.getLogicalType match {
        case d: LogicalTypes.Decimal => (DecimalType(d.getPrecision, d.getScale), false)
        case _ => (BinaryType, false)
      }
    case Schema.Type.RECORD => (toStructType(schema), false)
    case Schema.Type.ARRAY =>
      val (et, en) = toSparkType(schema.getElementType)
      (ArrayType(et, containsNull = en), false)
    case Schema.Type.MAP =>
      val (vt, vn) = toSparkType(schema.getValueType)
      (MapType(StringType, vt, valueContainsNull = vn), false)
    case Schema.Type.UNION =>
      val branches = schema.getTypes.asScala
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1 && branches.size == 2,
        s"only [null, T] unions supported, got: $schema")
      val (dt, _) = toSparkType(nonNull.head)
      (dt, true)
    case Schema.Type.NULL => (NullType, true)
  }

  def toStructType(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, s"expected record, got $schema")
    StructType(schema.getFields.asScala.map { f =>
      val (dt, nullable) = toSparkType(f.schema())
      StructField(f.name(), dt, nullable)
    }.toSeq)
  }

  /** Strip a [null, T] union to T; identity otherwise. */
  private def nonNullBranch(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION) s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  /** Avro datum → Catalyst value (UTF8String/InternalRow/ArrayData/…). */
  def toCatalyst(datum: AnyRef, schema: Schema): Any = {
    if (datum == null) return null
    val s = nonNullBranch(schema)
    s.getType match {
      case Schema.Type.BOOLEAN | Schema.Type.FLOAT | Schema.Type.DOUBLE => datum
      case Schema.Type.INT =>
        datum.asInstanceOf[java.lang.Integer] // DateType shares int encoding (days)
      case Schema.Type.LONG =>
        s.getLogicalType match {
          case _: LogicalTypes.TimestampMillis => datum.asInstanceOf[java.lang.Long] * 1000L
          case _ => datum
        }
      case Schema.Type.STRING | Schema.Type.ENUM => UTF8String.fromString(datum.toString)
      case Schema.Type.BYTES =>
        s.getLogicalType match {
          case d: LogicalTypes.Decimal =>
            val bytes = byteBufferToBytes(datum.asInstanceOf[ByteBuffer])
            Decimal(BigDecimal(BigInt(bytes), d.getScale), d.getPrecision, d.getScale)
          case _ => byteBufferToBytes(datum.asInstanceOf[ByteBuffer])
        }
      case Schema.Type.FIXED =>
        val bytes = datum.asInstanceOf[GenericFixed].bytes().clone()
        s.getLogicalType match {
          case d: LogicalTypes.Decimal =>
            Decimal(BigDecimal(BigInt(bytes), d.getScale), d.getPrecision, d.getScale)
          case _ => bytes
        }
      case Schema.Type.RECORD =>
        val rec = datum.asInstanceOf[GenericRecord]
        val fields = s.getFields.asScala
        val out = new Array[Any](fields.size)
        var i = 0
        while (i < fields.size) {
          out(i) = toCatalyst(rec.get(i).asInstanceOf[AnyRef], fields(i).schema())
          i += 1
        }
        new GenericInternalRow(out)
      case Schema.Type.ARRAY =>
        val items = datum.asInstanceOf[java.util.Collection[AnyRef]].asScala
        new GenericArrayData(items.map(toCatalyst(_, s.getElementType)).toArray)
      case Schema.Type.MAP =>
        val m = datum.asInstanceOf[java.util.Map[AnyRef, AnyRef]].asScala
        val keys = new Array[Any](m.size)
        val values = new Array[Any](m.size)
        var i = 0
        m.foreach { case (k, v) =>
          keys(i) = UTF8String.fromString(k.toString)
          values(i) = toCatalyst(v, s.getValueType)
          i += 1
        }
        new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(values))
      case other => throw new UnsupportedOperationException(s"avro type $other")
    }
  }

  /** Catalyst value → Avro datum, shaped by the target Avro schema. */
  def toAvro(value: Any, dataType: DataType, schema: Schema): AnyRef = {
    if (value == null) return null
    val s = nonNullBranch(schema)
    (dataType, s.getType) match {
      case (BooleanType | FloatType | DoubleType | IntegerType, _) => value.asInstanceOf[AnyRef]
      case (LongType, Schema.Type.LONG) => value.asInstanceOf[AnyRef]
      case (LongType, Schema.Type.INT) =>
        // narrowing for envelope timestamp-style int fields
        java.lang.Integer.valueOf(value.asInstanceOf[Long].toInt)
      case (TimestampType, Schema.Type.LONG) =>
        s.getLogicalType match {
          case _: LogicalTypes.TimestampMillis => java.lang.Long.valueOf(value.asInstanceOf[Long] / 1000L)
          case _ => value.asInstanceOf[AnyRef]
        }
      case (DateType, Schema.Type.INT) => value.asInstanceOf[AnyRef]
      case (StringType, Schema.Type.STRING) => value.toString
      case (StringType, Schema.Type.ENUM) => new GenericData.EnumSymbol(s, value.toString)
      case (BinaryType, Schema.Type.BYTES) => ByteBuffer.wrap(value.asInstanceOf[Array[Byte]])
      case (BinaryType, Schema.Type.FIXED) =>
        new GenericData.Fixed(s, value.asInstanceOf[Array[Byte]])
      case (dt: DecimalType, Schema.Type.BYTES) =>
        ByteBuffer.wrap(value.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue().toByteArray)
      case (st: StructType, Schema.Type.RECORD) =>
        // direct GenericData.Record by field position — GenericRecordBuilder
        // re-validates and default-fills every field per row, which dominates
        // the encode hot path at millions of rows.
        val row = value.asInstanceOf[InternalRow]
        val rec = new GenericData.Record(s)
        var i = 0
        while (i < st.fields.length) {
          val f = st.fields(i)
          val avroField = s.getField(f.name)
          require(avroField != null, s"field ${f.name} missing from avro schema ${s.getFullName}")
          val v = if (row.isNullAt(i)) null else row.get(i, f.dataType)
          rec.put(avroField.pos(), toAvro(v, f.dataType, avroField.schema()))
          i += 1
        }
        rec
      case (at: ArrayType, Schema.Type.ARRAY) =>
        val arr = value.asInstanceOf[ArrayData]
        val out = new java.util.ArrayList[AnyRef](arr.numElements())
        var i = 0
        while (i < arr.numElements()) {
          val v = if (arr.isNullAt(i)) null else arr.get(i, at.elementType)
          out.add(toAvro(v, at.elementType, s.getElementType))
          i += 1
        }
        out
      case (mt: MapType, Schema.Type.MAP) =>
        val m = value.asInstanceOf[MapData]
        val out = new java.util.HashMap[String, AnyRef](m.numElements())
        val keys = m.keyArray()
        val values = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          val v = if (values.isNullAt(i)) null else values.get(i, mt.valueType)
          out.put(keys.getUTF8String(i).toString, toAvro(v, mt.valueType, s.getValueType))
          i += 1
        }
        out
      case (dt, at) =>
        throw new UnsupportedOperationException(s"cannot encode $dt as avro $at")
    }
  }

  private def byteBufferToBytes(bb: ByteBuffer): Array[Byte] = {
    val dup = bb.duplicate()
    val out = new Array[Byte](dup.remaining())
    dup.get(out)
    out
  }
}
