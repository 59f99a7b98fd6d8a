package graft.tools

import scala.util.matching.Regex

import org.apache.spark.sql.types._

import DdlModel.{ColumnSpec, TableSpec}

/** MySQL `CREATE TABLE` (+`ALTER TABLE`) DDL → Avro schema JSON + Spark
  * StructType — the conversion behind the reference's primary CDC
  * registration path (reference: schematizer_clientlib/schematizer.py:745
  * register_schema_from_mysql_stmts;
  * tools/introspector/register/mysql_command.py feeds the same triple of
  * new/old/alter statements).
  *
  * Type mapping (MySQL semantics → the registry's Avro conventions shared
  * with [[RedshiftDdlConverter]]):
  *  - tinyint(1)/bool/boolean → boolean
  *  - tinyint/smallint/mediumint → int (all fit, signed or unsigned)
  *  - int/integer → int; `int unsigned` promotes to long (max 2^32-1)
  *  - bigint → long (+ `unsigned: true` meta for bigint unsigned — callers
  *    must treat the long as the unsigned bit pattern)
  *  - float → float; double/real → double
  *  - decimal/numeric(p,s) → double + `fixed_pt`/`precision`/`scale`
  *  - char(n) → string + `fixlen`; varchar(n) → string + `maxlen`;
  *    tinytext/text/mediumtext/longtext → string
  *  - binary(n)/varbinary(n)/blob family → bytes (+ fixlen/maxlen)
  *  - date → long + `date`; datetime/timestamp → long + `timestamp`;
  *    time → long + `time`; year → int + `year`
  *  - enum(...)/set(...) → string + `enum_values`/`set_values` meta
  *  - json → string + `json: true` meta
  * MySQL-isms handled: backtick quoting, UNSIGNED/ZEROFILL, CHARACTER
  * SET/COLLATE noise, AUTO_INCREMENT, ENGINE=.../charset table suffix,
  * KEY/INDEX/CONSTRAINT entries, inline and table-level PRIMARY KEY.
  */
object MysqlDdlConverter {

  /** Statement head only — the column body is cut by quote-aware paren
    * MATCHING ([[DdlModel.matchingParen]]), not a greedy regex: a table
    * suffix containing parens (PARTITION BY LIST (...) (...), COMMENT
    * with parens) pulled trailing clauses into the regex-captured body
    * and mis-parsed them as columns. */
  private val createHeadRe: Regex =
    """(?is)^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?:`?([\w]+)`?\.)?`?([\w]+)`?\s*\(""".r

  /** Constraint entries are recognized by whole WORD, not prefix — a
    * bare-prefix match dropped ordinary columns named key_id / checksum /
    * index_name / unique_token from the schema. (A column literally
    * named `key` must be backticked in real MySQL, which these patterns
    * deliberately don't match.) A NAMED primary key
    * (`CONSTRAINT pk_name PRIMARY KEY (a)`) is a PK entry, not a skip —
    * routing it through the CONSTRAINT skip lost every pkey ordinal. */
  private val PkEntryRe: Regex =
    """(?is)^(?:CONSTRAINT\s+`?[\w]+`?\s+)?PRIMARY\s+KEY\b.*""".r
  private val SkipEntryRe: Regex =
    """(?is)^(?:UNIQUE|KEY|INDEX|CONSTRAINT|FOREIGN\s+KEY|FULLTEXT|SPATIAL|CHECK)\b.*""".r

  private val nameTypeRe: Regex = """(?is)^`?([\w]+)`?\s+([\w]+)\s*(.*)$""".r

  /** (name, type, typeArgs, rest) — type args cut by quote-aware paren
    * matching so enum('a)b','c') keeps its full value list. */
  private[tools] def parseColDef(raw: String)
      : Option[(String, String, Option[String], String)] =
    raw.trim match {
      case nameTypeRe(name, tpe, tail0) =>
        val tail = tail0.trim
        if (tail.startsWith("(")) {
          val close = DdlModel.matchingParen(tail, 0, backslashEscapes = true)
          Some((name, tpe, Some(tail.substring(1, close)), tail.substring(close + 1)))
        } else Some((name, tpe, None, tail))
      case _ => None
    }

  def parse(ddl: String): TableSpec = parse(ddl, strict = false)

  /** `strict = true` rejects any body entry that is neither a
    * recognized constraint nor a parseable column instead of dropping
    * it — [[Bootstrapper]] registers schemas through strict mode so a
    * misrouted dialect can never "succeed" by silently losing columns. */
  def parse(ddl: String, strict: Boolean): TableSpec = {
    val head = createHeadRe.findFirstMatchIn(ddl).getOrElse(
      throw new IllegalArgumentException(s"unparseable CREATE TABLE: $ddl"))
    val open = head.end - 1
    val close = DdlModel.matchingParen(ddl, open, backslashEscapes = true)
    val (schemaName, tableName, body) =
      (Option(head.group(1)).getOrElse("default"), head.group(2),
        ddl.substring(open + 1, close))
    val tableConstraints = scala.collection.mutable.ArrayBuffer.empty[String]
    val cols = DdlModel.splitColumns(body, backslashEscapes = true).flatMap { raw =>
      if (PkEntryRe.matches(raw)) { tableConstraints += raw; None }
      else if (SkipEntryRe.matches(raw)) None
      else parseColDef(raw) match {
        case Some((name, tpe, args, rest)) =>
          Some(buildColumn(name, tpe.toLowerCase, args, rest))
        case None if strict =>
          throw new IllegalArgumentException(s"unparseable column entry: $raw")
        case None => None
      }
    }
    val tablePk: Seq[String] = tableConstraints.headOption.toSeq.flatMap { c =>
      """(?i)PRIMARY\s+KEY\s*\(([^)]*)\)""".r.findFirstMatchIn(c).toSeq
        .flatMap(_.group(1).split(",").map(_.trim.stripPrefix("`").stripSuffix("`")))
    }
    val withPk =
      if (tablePk.isEmpty) cols
      else cols.map { c =>
        val ix = tablePk.indexWhere(_.equalsIgnoreCase(c.name))
        if (ix >= 0) c.copy(pkeyOrdinal = Some(ix + 1)) else c
      }
    TableSpec(schemaName, tableName, withPk)
  }

  private def intArgs(args: Option[String]): (Option[Int], Option[Int]) = {
    val parts = args.toSeq.flatMap(_.split(",")).map(_.trim).filter(_.matches("\\d+"))
    (parts.headOption.map(_.toInt), parts.lift(1).map(_.toInt))
  }

  /** MySQL string-literal unescape: `''` → `'`, `\n`/`\t`/`\r`/`\0`/
    * `\b`/`\Z` → control chars, `\%`/`\_` keep the backslash (MySQL
    * reserves them for LIKE), any other `\x` → `x`. */
  private[tools] def decodeMysqlString(raw: String): String = {
    val sb = new StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '\'' && i + 1 < raw.length && raw.charAt(i + 1) == '\'') {
        sb.append('\''); i += 2
      } else if (c == '\\' && i + 1 < raw.length) {
        raw.charAt(i + 1) match {
          case 'n' => sb.append('\n')
          case 't' => sb.append('\t')
          case 'r' => sb.append('\r')
          case '0' => sb.append('\u0000')
          case 'b' => sb.append('\b')
          case 'Z' => sb.append('\u001a')
          case e @ ('%' | '_') => sb.append('\\').append(e)
          case e => sb.append(e)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Enum/set value list — each literal cut by the shared quote scanner
    * and DECODED: the old `'([^']*)'` regex split `'don''t'` (the form
    * SHOW CREATE TABLE emits) into two wrong values and desynced on
    * `\'`. */
  private def quotedList(args: Option[String]): Seq[String] =
    args.toSeq.flatMap { s =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == '\'') {
          val end = DdlModel.quoteSpanEnd(s, i, backslashEscapes = true)
          val closed = end <= s.length && end > i + 1 && s.charAt(end - 1) == '\''
          out += decodeMysqlString(s.substring(i + 1, if (closed) end - 1 else end))
          i = end
        } else i += 1
      }
      out.toSeq
    }

  private def buildColumn(name: String, tpe: String, args: Option[String],
                          rest: String): ColumnSpec = {
    val upperRest = rest.toUpperCase
    val unsigned = upperRest.contains("UNSIGNED")
    val notNull = upperRest.contains("NOT NULL")
    val isInlinePk = upperRest.contains("PRIMARY KEY")
    val defaultNull = !upperRest.contains("DEFAULT") ||
      """(?i)DEFAULT\s+NULL""".r.findFirstIn(rest).isDefined
    val nullable = !notNull && !isInlinePk
    val (len, scale) = intArgs(args)

    val (avroType, metas, sparkType): (String, Seq[(String, String)], DataType) =
      tpe match {
        case "tinyint" if len.contains(1) => ("boolean", Nil, BooleanType)
        case "bool" | "boolean" => ("boolean", Nil, BooleanType)
        // BIT(1) is MySQL's other boolean idiom; wider bit fields ride
        // as bytes with the declared width (MySQL returns b'...' values
        // as binary)
        case "bit" if len.forall(_ == 1) => ("boolean", Nil, BooleanType)
        case "bit" =>
          ("bytes", len.map(l => "bits" -> l.toString).toSeq, BinaryType)
        case "tinyint" | "smallint" | "mediumint" => ("int", Nil, IntegerType)
        case "int" | "integer" =>
          if (unsigned) ("long", Nil, LongType) else ("int", Nil, IntegerType)
        case "bigint" =>
          ("long", if (unsigned) Seq("unsigned" -> "true") else Nil, LongType)
        case "float" => ("float", Nil, FloatType)
        case "double" | "real" => ("double", Nil, DoubleType)
        case "decimal" | "numeric" | "dec" | "fixed" =>
          val p = len.getOrElse(10); val s = scale.getOrElse(0)
          ("double",
            Seq("fixed_pt" -> "true", "precision" -> p.toString, "scale" -> s.toString),
            DecimalType(p, s))
        case "char" =>
          ("string", len.map(l => "fixlen" -> l.toString).toSeq, StringType)
        case "varchar" =>
          ("string", len.map(l => "maxlen" -> l.toString).toSeq, StringType)
        case "tinytext" | "text" | "mediumtext" | "longtext" =>
          ("string", Nil, StringType)
        case "binary" =>
          ("bytes", len.map(l => "fixlen" -> l.toString).toSeq, BinaryType)
        case "varbinary" =>
          ("bytes", len.map(l => "maxlen" -> l.toString).toSeq, BinaryType)
        case "tinyblob" | "blob" | "mediumblob" | "longblob" =>
          ("bytes", Nil, BinaryType)
        case "date" => ("long", Seq("date" -> "true"), DateType)
        case "datetime" | "timestamp" => ("long", Seq("timestamp" -> "true"), TimestampType)
        case "time" => ("long", Seq("time" -> "true"), LongType)
        case "year" => ("int", Seq("year" -> "true"), IntegerType)
        case "enum" =>
          val vals = quotedList(args).map(DdlModel.jstr).mkString("[", ", ", "]")
          ("string", Seq("enum_values" -> vals), StringType)
        case "set" =>
          val vals = quotedList(args).map(DdlModel.jstr).mkString("[", ", ", "]")
          ("string", Seq("set_values" -> vals), StringType)
        case "json" => ("string", Seq("json" -> "true"), StringType)
        case other =>
          throw new IllegalArgumentException(s"unsupported mysql type: $other")
      }
    ColumnSpec(name, avroType, nullable, defaultNull, metas,
      if (isInlinePk) Some(1) else None, sparkType)
  }

  // --- ALTER TABLE validation -------------------------------------------

  private val alterHeadRe: Regex =
    """(?is)ALTER\s+TABLE\s+(?:`?[\w]+`?\.)?`?([\w]+)`?\s+(.*?);?\s*$""".r

  /** Apply an `ALTER TABLE` statement (ADD/DROP/MODIFY/CHANGE COLUMN
    * clauses) to a parsed table. Used to validate that old + alter ⇒ new
    * before registration — the same consistency check the reference
    * Schematizer performs on the (new, old, alter) statement triple. */
  def applyAlter(table: TableSpec, alterStmt: String): TableSpec = {
    val (t, clauses) = alterStmt match {
      case alterHeadRe(name, body) =>
        (name, DdlModel.splitColumns(body, backslashEscapes = true))
      case _ => throw new IllegalArgumentException(s"unparseable ALTER TABLE: $alterStmt")
    }
    require(t.equalsIgnoreCase(table.table),
      s"ALTER targets `$t` but table is `${table.table}`")
    clauses.foldLeft(table) { (acc, clause) =>
      val c = clause.trim
      val upper = c.toUpperCase
      def colDef(s: String): ColumnSpec = parseColDef(s)
        .map { case (name, tpe, args, rest) =>
          buildColumn(name, tpe.toLowerCase, args, rest) }
        .getOrElse(throw new IllegalArgumentException(s"unparseable column def: $s"))
      def stripPositional(s: String): String =
        s.replaceAll("(?i)\\s+(FIRST|AFTER\\s+`?[\\w]+`?)\\s*$", "")
      // non-column ADD/DROP forms are excluded by whole word — ADD
      // UNIQUE/FULLTEXT/SPATIAL INDEX and DROP CHECK/CONSTRAINT are
      // legal MySQL that a prefix list rejected as bad column defs
      val addNonColumn = upper.matches(
        "(?s)ADD\\s+(?:INDEX|KEY|CONSTRAINT|PRIMARY|UNIQUE|FULLTEXT|SPATIAL|FOREIGN|CHECK|PARTITION)\\b.*")
      val dropNonColumn = upper.matches(
        "(?s)DROP\\s+(?:INDEX|KEY|PRIMARY|FOREIGN|CHECK|CONSTRAINT|PARTITION)\\b.*")
      if (upper.startsWith("ADD COLUMN") ||
          (upper.startsWith("ADD ") && !addNonColumn)) {
        val body = stripPositional(c.replaceFirst("(?i)^ADD\\s+(COLUMN\\s+)?", ""))
        acc.copy(columns = acc.columns :+ colDef(body))
      } else if (upper.startsWith("DROP COLUMN") ||
          (upper.startsWith("DROP ") && !dropNonColumn)) {
        val name = c.replaceFirst("(?i)^DROP\\s+(COLUMN\\s+)?", "")
          .trim.stripPrefix("`").stripSuffix("`")
        require(acc.columns.exists(_.name.equalsIgnoreCase(name)),
          s"DROP COLUMN `$name`: no such column")
        acc.copy(columns = acc.columns.filterNot(_.name.equalsIgnoreCase(name)))
      } else if (upper.startsWith("MODIFY")) {
        val d = colDef(stripPositional(c.replaceFirst("(?i)^MODIFY\\s+(COLUMN\\s+)?", "")))
        require(acc.columns.exists(_.name.equalsIgnoreCase(d.name)),
          s"MODIFY COLUMN `${d.name}`: no such column")
        acc.copy(columns = acc.columns.map(x =>
          if (x.name.equalsIgnoreCase(d.name)) d.copy(pkeyOrdinal = x.pkeyOrdinal) else x))
      } else if (upper.startsWith("CHANGE")) {
        val body = stripPositional(c.replaceFirst("(?i)^CHANGE\\s+(COLUMN\\s+)?", ""))
        val oldName = body.trim.takeWhile(!_.isWhitespace).stripPrefix("`").stripSuffix("`")
        val d = colDef(body.trim.dropWhile(!_.isWhitespace))
        require(acc.columns.exists(_.name.equalsIgnoreCase(oldName)),
          s"CHANGE COLUMN `$oldName`: no such column")
        acc.copy(columns = acc.columns.map(x =>
          if (x.name.equalsIgnoreCase(oldName)) d.copy(pkeyOrdinal = x.pkeyOrdinal) else x))
      } else acc // RENAME/ENGINE/index-only clauses don't affect the schema
    }
  }

  /** Validate a (new, old, alter) statement triple: old + alter must land
    * on the same column names/types as new. Returns the parsed new spec. */
  def validateStatementTriple(newCreate: String, oldCreate: String,
                              alter: String): TableSpec = {
    val newSpec = parse(newCreate)
    val derived = applyAlter(parse(oldCreate), alter)
    // compared by NAME, not position: applyAlter appends added columns
    // at the end while ADD COLUMN ... AFTER x places them — a
    // position-sensitive compare rejected consistent positional
    // migrations. What must agree is the column SET and each column's
    // type/nullability.
    def shape(t: TableSpec) = t.columns
      .map(c => (c.name.toLowerCase, c.avroType, c.nullable)).sortBy(_._1)
    require(shape(derived) == shape(newSpec),
      s"old + alter does not produce the new table: derived ${shape(derived)}, " +
        s"declared ${shape(newSpec)}")
    newSpec
  }
}
