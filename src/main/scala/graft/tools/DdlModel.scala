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
        val metaAttrs = c.metas.map { case (k, v) => s""","$k": $v""" }.mkString
        val pkeyAttr = c.pkeyOrdinal.map(o => s""","pkey": $o""").getOrElse("")
        val defaultAttr = if (c.nullable && c.defaultIsNull) s""","default": null""" else ""
        s"""{"name": "${c.name}", "type": $tpe$metaAttrs$pkeyAttr$defaultAttr}"""
      }
      s"""{"type": "record", "namespace": "$schema", "name": "$table",
         | "fields": [${fields.mkString(", ")}]}""".stripMargin
    }

    def structType: StructType =
      StructType(columns.map(c => StructField(c.name, c.sparkType, c.nullable)))

    def primaryKeys: Seq[String] =
      columns.filter(_.pkeyOrdinal.isDefined).sortBy(_.pkeyOrdinal.get).map(_.name)
  }

  /** Split a DDL column body on top-level commas (decimal(10,2) and
    * enum('a','b') safe). */
  def splitColumns(body: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    body.foreach {
      case '(' => depth += 1; sb.append('(')
      case ')' => depth -= 1; sb.append(')')
      case ',' if depth == 0 => out += sb.toString; sb.clear()
      case c => sb.append(c)
    }
    if (sb.nonEmpty) out += sb.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }
}
