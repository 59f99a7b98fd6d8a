package graft.tools

import scala.util.matching.Regex

import org.apache.spark.sql.types._

import DdlModel.{ColumnSpec, TableSpec}

/** Redshift `CREATE TABLE` DDL → Avro schema JSON + Spark StructType
  * (reference: tools/redshift_sql_to_avsc.py:31-230 — the bootstrapper's
  * schema-conversion path).
  *
  * Type mapping follows the reference's conventions: integer families →
  * int/long, varchar/nvarchar/text → string with `maxlen` meta, char →
  * string with `fixlen` meta, decimal/numeric → double with `fixed_pt`/
  * `precision`/`scale` metas, timestamp/date → long with a `timestamp`/
  * `date` meta, NULLable columns → unions ordered by whether the default
  * is null (`["null", T]` vs `[T, "null"]`), primary keys →
  * `pkey: <ordinal>`. One deliberate deviation: the reference maps
  * `date` to a STRING with a date meta (redshift_sql_to_avsc.py:54) —
  * here it is a long epoch-day like the MySQL converter's, so the two
  * dialects share one Avro convention and date columns stay orderable.
  */
object RedshiftDdlConverter {

  /** Statement head only; the body is cut by quote-aware paren matching
    * — DISTKEY(...)/SORTKEY(...)/INTERLEAVED SORTKEY(...) suffixes
    * polluted a greedy regex capture (same hazard as the MySQL
    * converter's PARTITION BY). */
  private val createHeadRe: Regex =
    """(?is)^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?:"?([\w]+)"?\.)?"?([\w]+)"?\s*\(""".r

  private val colRe: Regex =
    """(?is)^"?([\w]+)"?\s+([\w]+)(?:\s*\(\s*(\d+)\s*(?:,\s*(\d+))?\s*\))?(.*)$""".r

  /** Constraint entries matched by whole WORD — a bare prefix dropped
    * ordinary columns named unique_visitors etc. A NAMED primary key
    * (`CONSTRAINT t_pk PRIMARY KEY (a)` — legal Redshift) is a PK
    * entry; other named constraints skip via the CONSTRAINT word
    * (previously they fell through to colRe, parsed as a column named
    * CONSTRAINT, and threw — handing the DDL to the MySQL fallback,
    * which lost the pkey ordinals). */
  private val PkEntryRe: Regex =
    """(?is)^(?:CONSTRAINT\s+"?[\w]+"?\s+)?PRIMARY\s+KEY\b.*""".r
  private val SkipEntryRe: Regex =
    """(?is)^(?:UNIQUE|FOREIGN\s+KEY|CONSTRAINT)\b.*""".r

  def parse(ddl: String): TableSpec = parse(ddl, strict = false)

  /** `strict = true` rejects any body entry that is neither a
    * recognized constraint nor a parseable column instead of dropping
    * it — see [[MysqlDdlConverter.parse]]. */
  def parse(ddl: String, strict: Boolean): TableSpec = {
    val head = createHeadRe.findFirstMatchIn(ddl).getOrElse(
      throw new IllegalArgumentException(s"unparseable CREATE TABLE: $ddl"))
    val open = head.end - 1
    val close = DdlModel.matchingParen(ddl, open)
    val (schemaName, tableName, body) =
      (Option(head.group(1)).getOrElse("public"), head.group(2),
        ddl.substring(open + 1, close))
    val tableConstraints = scala.collection.mutable.ArrayBuffer.empty[String]
    val cols = DdlModel.splitColumns(body).flatMap { raw =>
      if (PkEntryRe.matches(raw)) {
        tableConstraints += raw; None
      } else if (SkipEntryRe.matches(raw)) {
        None
      } else raw match {
        case colRe(name, tpe, len, scale, rest) =>
          Some(buildColumn(name, tpe.toLowerCase,
            Option(len).map(_.toInt), Option(scale).map(_.toInt), rest))
        case _ if strict =>
          throw new IllegalArgumentException(s"unparseable column entry: $raw")
        case _ => None
      }
    }
    // table-level PRIMARY KEY (a, b) overrides/augments inline pkeys
    val tablePk: Seq[String] = tableConstraints.headOption.toSeq.flatMap { c =>
      """(?i)PRIMARY\s+KEY\s*\(([^)]*)\)""".r.findFirstMatchIn(c).toSeq
        .flatMap(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")))
    }
    val withPk =
      if (tablePk.isEmpty) cols
      else cols.map { c =>
        val ix = tablePk.indexWhere(_.equalsIgnoreCase(c.name))
        if (ix >= 0) c.copy(pkeyOrdinal = Some(ix + 1)) else c
      }
    TableSpec(schemaName, tableName, withPk)
  }

  private def buildColumn(name: String, tpe: String, len: Option[Int],
                          scale: Option[Int], rest: String): ColumnSpec = {
    val upperRest = rest.toUpperCase
    val notNull = upperRest.contains("NOT NULL")
    val isInlinePk = upperRest.contains("PRIMARY KEY")
    val defaultNull = !upperRest.contains("DEFAULT") ||
      """(?i)DEFAULT\s+NULL""".r.findFirstIn(rest).isDefined
    val nullable = !notNull && !isInlinePk

    val (avroType, metas, sparkType): (String, Seq[(String, String)], DataType) = tpe match {
      case "smallint" | "int2" => ("int", Nil, ShortType)
      case "integer" | "int" | "int4" => ("int", Nil, IntegerType)
      case "bigint" | "int8" => ("long", Nil, LongType)
      case "real" | "float4" => ("float", Nil, FloatType)
      case "double" | "float8" | "float" => ("double", Nil, DoubleType)
      case "boolean" | "bool" => ("boolean", Nil, BooleanType)
      case "decimal" | "numeric" =>
        val p = len.getOrElse(18); val s = scale.getOrElse(0)
        ("double",
          Seq("fixed_pt" -> "true", "precision" -> p.toString, "scale" -> s.toString),
          DecimalType(p, s))
      case "varchar" | "nvarchar" | "character varying" | "text" =>
        ("string", len.map(l => "maxlen" -> l.toString).toSeq, StringType)
      case "char" | "character" | "nchar" | "bpchar" =>
        ("string", len.map(l => "fixlen" -> l.toString).toSeq, StringType)
      case "timestamp" | "timestamptz" =>
        ("long", Seq("timestamp" -> "true"), TimestampType)
      case "date" => ("long", Seq("date" -> "true"), DateType)
      case other =>
        throw new IllegalArgumentException(s"unsupported redshift type: $other")
    }
    ColumnSpec(name, avroType, nullable, defaultNull, metas,
      if (isInlinePk) Some(1) else None, sparkType)
  }
}
