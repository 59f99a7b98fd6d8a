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

  /** Index just past the end of the quoted span opening at `i`
    * (`s(i)` must be `'`, `"` or a backtick). One scanner shared by
    * [[splitColumns]], [[matchingParen]] and the MySQL enum/set value
    * decoder so the quoting rules can never diverge between column
    * splitting, body cutting, and value extraction.
    *
    * A doubled quote char is always an escape (SQL `''`, `""`, MySQL
    * ` `` ` in identifiers). With `backslashEscapes` (MySQL string
    * semantics), a backslash inside a `'`/`"` literal escapes the next
    * char — without it (standard SQL / Redshift), `'C:\'` is a complete
    * literal ending in a backslash. Backticks never take backslash
    * escapes in either dialect. An unterminated span ends at the
    * string's end. */
  private[tools] def quoteSpanEnd(s: String, i: Int,
                                  backslashEscapes: Boolean): Int = {
    val q = s.charAt(i)
    var j = i + 1
    while (j < s.length) {
      val c = s.charAt(j)
      if (backslashEscapes && q != '`' && c == '\\' && j + 1 < s.length) j += 2
      else if (c == q) {
        if (j + 1 < s.length && s.charAt(j + 1) == q) j += 2
        else return j + 1
      } else j += 1
    }
    j
  }

  /** Split a DDL column body on top-level commas — paren-depth AND
    * quote aware: parens or commas inside single-quoted literals
    * (`DEFAULT '('`, `enum('a)b','c')` — '' is the escaped quote, and
    * under `backslashEscapes` so is MySQL's `\'`), double-quoted or
    * backticked identifiers never split or shift depth. A quote-blind
    * split silently dropped every column after a quoted '(' (depth
    * never returned to 0); a backslash-blind one desynced on the `\'`
    * MySQL itself emits from SHOW CREATE TABLE. */
  def splitColumns(body: String, backslashEscapes: Boolean = false): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    var i = 0
    while (i < body.length) {
      body.charAt(i) match {
        case '\'' | '"' | '`' =>
          val end = quoteSpanEnd(body, i, backslashEscapes)
          sb.append(body.substring(i, end)); i = end
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' => depth -= 1; sb.append(')'); i += 1
        case ',' if depth == 0 => out += sb.toString; sb.clear(); i += 1
        case other => sb.append(other); i += 1
      }
    }
    if (sb.nonEmpty) out += sb.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Index of the ')' matching the '(' at `open`, with the same quote
    * discipline as [[splitColumns]]. Lets the CREATE TABLE parsers cut
    * the column body by matching instead of a greedy regex — a table
    * suffix containing parens (PARTITION BY LIST (...), SORTKEY(...))
    * polluted the regex-captured body. */
  def matchingParen(s: String, open: Int,
                    backslashEscapes: Boolean = false): Int = {
    require(open < s.length && s.charAt(open) == '(',
      s"expected '(' at offset $open")
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' | '"' | '`' => i = quoteSpanEnd(s, i, backslashEscapes)
        case '(' => depth += 1; i += 1
        case ')' =>
          depth -= 1; if (depth == 0) return i
          i += 1
        case _ => i += 1
      }
    }
    throw new IllegalArgumentException("unbalanced parentheses in DDL")
  }
}
