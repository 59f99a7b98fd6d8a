package graft.tools

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema

import graft.functions.AvroCodec

/** Schema migration plan: old schema → new schema as SQL DDL
  * (reference: schematizer.py:1244 get_schema_migration — the Schematizer
  * renders a Redshift migration for a schema pair).
  */
object SchemaMigration {

  /** CREATE TABLE when `from` is absent, else ALTER TABLE statements:
    * drops first, then adds (with defaults where the avro schema has one),
    * then type changes. Renames are modeled as drop+add (avro carries no
    * rename lineage — same as the reference). */
  def plan(fromJson: Option[String], toJson: String, tableName: String): Seq[String] = {
    val to = AvroCodec.parse(toJson)
    fromJson match {
      case None =>
        val cols = to.getFields.asScala.map(f => s"  ${f.name()} ${sqlType(f.schema())}")
        Seq(s"CREATE TABLE $tableName (\n${cols.mkString(",\n")}\n);")
      case Some(fj) =>
        val from = AvroCodec.parse(fj)
        val fromFields = from.getFields.asScala.map(f => f.name() -> f).toMap
        val toFields = to.getFields.asScala.map(f => f.name() -> f).toMap
        val drops = from.getFields.asScala.collect {
          case f if !toFields.contains(f.name()) =>
            s"ALTER TABLE $tableName DROP COLUMN ${f.name()};"
        }
        val adds = to.getFields.asScala.collect {
          case f if !fromFields.contains(f.name()) =>
            val default = Option(f.defaultVal())
              .filterNot(_ == org.apache.avro.JsonProperties.NULL_VALUE)
              .map(d => s" DEFAULT $d").getOrElse("")
            s"ALTER TABLE $tableName ADD COLUMN ${f.name()} ${sqlType(f.schema())}$default;"
        }
        val retypes = to.getFields.asScala.collect {
          case f if fromFields.contains(f.name()) &&
            sqlType(f.schema()) != sqlType(fromFields(f.name()).schema()) =>
            s"ALTER TABLE $tableName ALTER COLUMN ${f.name()} TYPE ${sqlType(f.schema())};"
        }
        (drops ++ adds ++ retypes).toSeq
    }
  }

  private def sqlType(s: Schema): String = {
    val base = if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s
    val t = base.getType match {
      case Schema.Type.INT => "INTEGER"
      case Schema.Type.LONG => "BIGINT"
      case Schema.Type.FLOAT => "REAL"
      case Schema.Type.DOUBLE => "DOUBLE PRECISION"
      case Schema.Type.BOOLEAN => "BOOLEAN"
      case Schema.Type.STRING | Schema.Type.ENUM => "VARCHAR"
      case Schema.Type.BYTES | Schema.Type.FIXED => "VARBYTE"
      case other => throw new IllegalArgumentException(s"no SQL type for avro $other")
    }
    if (s.getType == Schema.Type.UNION) t else s"$t NOT NULL"
  }
}
