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
    * then type changes, then nullability changes (SET/DROP NOT NULL as
    * their own statements — `NOT NULL` is not legal inside an
    * `ALTER COLUMN ... TYPE` clause, and folding it into the type string
    * also left nullable-ward migrations with the constraint in place).
    * Renames are modeled as drop+add (avro carries no rename lineage —
    * same as the reference).
    *
    * Dialect notes: statements use Postgres-family grammar. Redshift
    * proper cannot ALTER a column's nullability (or, on most types, its
    * TYPE) — a consumer executing this plan against Redshift must
    * rewrite retype/renull statements as add-copy-drop-rename rebuild
    * steps; the plan deliberately still STATES the change so no
    * migration step can be silently lost. ADD COLUMN renders NOT NULL
    * before DEFAULT, matching the column shape the reference's own
    * Redshift DDL parser expects (redshift_sql_to_avsc.py:136 — default
    * must follow the NULL/NOT NULL clause), so emitted DDL round-trips
    * through [[RedshiftDdlConverter]]. */
  def plan(fromJson: Option[String], toJson: String, tableName: String): Seq[String] = {
    val to = AvroCodec.parse(toJson)
    fromJson match {
      case None =>
        val cols = to.getFields.asScala.map(f =>
          s"  ${f.name()} ${sqlType(f.schema())}${notNullSuffix(f.schema())}")
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
              .map(d => s" DEFAULT ${sqlLiteral(d)}").getOrElse("")
            s"ALTER TABLE $tableName ADD COLUMN ${f.name()} " +
              s"${sqlType(f.schema())}${notNullSuffix(f.schema())}$default;"
        }
        val retypes = to.getFields.asScala.collect {
          case f if fromFields.contains(f.name()) &&
            sqlType(f.schema()) != sqlType(fromFields(f.name()).schema()) =>
            s"ALTER TABLE $tableName ALTER COLUMN ${f.name()} TYPE ${sqlType(f.schema())};"
        }
        val renulls = to.getFields.asScala.collect {
          case f if fromFields.contains(f.name()) &&
            isNullable(f.schema()) != isNullable(fromFields(f.name()).schema()) =>
            if (isNullable(f.schema()))
              s"ALTER TABLE $tableName ALTER COLUMN ${f.name()} DROP NOT NULL;"
            else
              s"ALTER TABLE $tableName ALTER COLUMN ${f.name()} SET NOT NULL;"
        }
        (drops ++ adds ++ retypes ++ renulls).toSeq
    }
  }

  /** Render an Avro default as a SQL literal: strings/enums quote (with
    * '' escaping — a raw interpolation emitted barewords like
    * `DEFAULT new` that fail to execute or bind to identifiers),
    * booleans as TRUE/FALSE, numbers verbatim. */
  private def sqlLiteral(v: AnyRef): String = v match {
    case n: Number => n.toString
    case b: java.lang.Boolean => if (b) "TRUE" else "FALSE"
    case other => "'" + other.toString.replace("'", "''") + "'"
  }

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION &&
      s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  private def notNullSuffix(s: Schema): String =
    if (isNullable(s)) "" else " NOT NULL"

  /** The bare SQL type — nullability is rendered separately by the
    * caller (see [[plan]]). */
  private def sqlType(s: Schema): String = {
    val base = if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(
        throw new IllegalArgumentException(s"union with no non-null branch: $s"))
    else s
    base.getType match {
      case Schema.Type.INT => "INTEGER"
      case Schema.Type.LONG => "BIGINT"
      case Schema.Type.FLOAT => "REAL"
      case Schema.Type.DOUBLE => "DOUBLE PRECISION"
      case Schema.Type.BOOLEAN => "BOOLEAN"
      case Schema.Type.STRING | Schema.Type.ENUM => "VARCHAR"
      case Schema.Type.BYTES | Schema.Type.FIXED => "VARBYTE"
      case other => throw new IllegalArgumentException(s"no SQL type for avro $other")
    }
  }
}
