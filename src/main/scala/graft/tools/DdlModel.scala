package graft.tools

import org.apache.spark.sql.types._

/** Shared output model for the SQL-DDL → Avro converters
  * (Redshift: reference tools/redshift_sql_to_avsc.py; MySQL: the
  * Schematizer-service conversion behind
  * schematizer_clientlib/schematizer.py:745 register_schema_from_mysql_stmts).
  *
  * Conventions shared by both dialects: NULLable columns become unions
  * ordered by whether the default is null (`["null", T]` vs `[T, "null"]`),
  * length/precision info rides as extra json attributes (`maxlen`,
  * `fixlen`, `fixed_pt`/`precision`/`scale`, `timestamp`/`date`), primary
  * keys as `pkey: <ordinal>`.
  */
object DdlModel {

  /** JSON-escape a string for interpolation inside double quotes — column
    * names, namespaces, and enum/set values may carry quotes, backslashes,
    * or control characters (MySQL `enum('a"b')` is legal DDL) and would
    * otherwise render invalid Avro JSON that fails much later at parse. */
  def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Render a JSON string literal (quotes included). */
  def jstr(s: String): String = s""""${jsonEscape(s)}""""

  final case class ColumnSpec(
      name: String,
      avroType: String, // base avro primitive
      nullable: Boolean,
      defaultIsNull: Boolean,
      metas: Seq[(String, String)], // rendered as extra json attributes
      pkeyOrdinal: Option[Int],
      sparkType: DataType)

  final case class TableSpec(schema: String, table: String, columns: Seq[ColumnSpec]) {

    def avroSchemaJson: String = {
      val fields = columns.map { c =>
        val tpe =
          if (!c.nullable) s""""${c.avroType}""""
          else if (c.defaultIsNull) s"""["null", "${c.avroType}"]"""
          else s"""["${c.avroType}", "null"]"""
        val metaAttrs = c.metas.map { case (k, v) => s""",${jstr(k)}: $v""" }.mkString
        val pkeyAttr = c.pkeyOrdinal.map(o => s""","pkey": $o""").getOrElse("")
        val defaultAttr = if (c.nullable && c.defaultIsNull) s""","default": null""" else ""
        s"""{"name": ${jstr(c.name)}, "type": $tpe$metaAttrs$pkeyAttr$defaultAttr}"""
      }
      s"""{"type": "record", "namespace": ${jstr(schema)}, "name": ${jstr(table)},
         | "fields": [${fields.mkString(", ")}]}""".stripMargin
    }

    def structType: StructType =
      StructType(columns.map(c => StructField(c.name, c.sparkType, c.nullable)))

    def primaryKeys: Seq[String] =
      columns.filter(_.pkeyOrdinal.isDefined).sortBy(_.pkeyOrdinal.get).map(_.name)
  }

  /** Split a DDL column body on top-level commas — paren-depth AND
    * quote aware: parens or commas inside single-quoted literals
    * (`DEFAULT '('`, `enum('a)b','c')` — '' is the escaped quote),
    * double-quoted or backticked identifiers never split or shift
    * depth. A quote-blind split silently dropped every column after a
    * quoted '(' (depth never returned to 0). */
  def splitColumns(body: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (quote != 0) {
        sb.append(c)
        if (c == quote) {
          if (quote == '\'' && i + 1 < body.length && body.charAt(i + 1) == '\'') {
            sb.append('\''); i += 1 // '' = escaped quote, literal continues
          } else quote = 0
        }
      } else c match {
        case '\'' | '"' | '`' => quote = c; sb.append(c)
        case '(' => depth += 1; sb.append(c)
        case ')' => depth -= 1; sb.append(c)
        case ',' if depth == 0 => out += sb.toString; sb.clear()
        case other => sb.append(other)
      }
      i += 1
    }
    if (sb.nonEmpty) out += sb.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Index of the ')' matching the '(' at `open`, with the same quote
    * discipline as [[splitColumns]]. Lets the CREATE TABLE parsers cut
    * the column body by matching instead of a greedy regex — a table
    * suffix containing parens (PARTITION BY LIST (...), SORTKEY(...))
    * polluted the regex-captured body. */
  def matchingParen(s: String, open: Int): Int = {
    require(open < s.length && s.charAt(open) == '(',
      s"expected '(' at offset $open")
    var depth = 0
    var quote: Char = 0
    var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (c == quote) {
          if (quote == '\'' && i + 1 < s.length && s.charAt(i + 1) == '\'') i += 1
          else quote = 0
        }
      } else c match {
        case '\'' | '"' | '`' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException("unbalanced parentheses in DDL")
  }
}
