package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PII scrubbing for display (reference: message.py:557-563,
  * _avro_payload.py:103-112): replace every leaf value with its type name
  * so tailer/debug output of PII topics never leaks data; binary leaves
  * show as their type name too (the reference hex-encodes non-PII bytes
  * but redacts PII ones — we redact all on PII topics).
  */
object Scrub {

  /** Scrubbed rendering of a struct column: same shape, every leaf value
    * replaced by its type name string. */
  def scrubbed(payload: Column, schema: StructType): Column =
    struct(schema.fields.map(f => scrubValue(payload.getField(f.name), f.dataType).as(f.name)): _*)

  private def scrubValue(c: Column, dt: DataType): Column = dt match {
    case st: StructType => scrubbed(c, st)
    case ArrayType(et, _) => transform(c, x => scrubValue(x, et))
    case other => when(c.isNull, lit(null).cast("string")).otherwise(lit(typeName(other)))
  }

  private def typeName(dt: DataType): String = dt match {
    case IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case BooleanType => "boolean"
    case StringType => "string"
    case BinaryType => "bytes"
    case TimestampType => "timestamp"
    case DateType => "date"
    case d: DecimalType => "decimal"
    case m: MapType => "map"
    case other => other.typeName
  }

  /** Conditional scrub: redact only when the topic is PII-flagged. */
  def scrubbedIfPii(payload: Column, schema: StructType, isPii: Column): Column =
    when(isPii, scrubbed(payload, schema).cast("string"))
      .otherwise(payload.cast("string"))
}
