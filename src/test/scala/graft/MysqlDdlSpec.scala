package graft

import org.apache.avro.Schema
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.SchemaRegistry
import graft.tools.MysqlDdlConverter

/** MySQL `CREATE TABLE` → Avro conversion + registration
  * (reference: schematizer.py:745 register_schema_from_mysql_stmts;
  * tools/introspector/register/mysql_command.py statement triple). */
class MysqlDdlSpec extends AnyFunSuite {

  private val bizDdl =
    """CREATE TABLE `yelp`.`business` (
      |  `id` BIGINT UNSIGNED NOT NULL AUTO_INCREMENT,
      |  `name` VARCHAR(64) NOT NULL,
      |  `acronym` CHAR(3) DEFAULT NULL,
      |  `review_count` INT NOT NULL DEFAULT 0,
      |  `rating` DECIMAL(3, 2),
      |  `is_open` TINYINT(1) NOT NULL,
      |  `flavor` ENUM('plain','fancy') NOT NULL,
      |  `blob_data` VARBINARY(256),
      |  `opened_on` DATE,
      |  `updated_at` TIMESTAMP NOT NULL,
      |  PRIMARY KEY (`id`, `name`),
      |  KEY `ix_name` (`name`)
      |) ENGINE=InnoDB DEFAULT CHARSET=utf8;""".stripMargin

  test("types, nullability, defaults, metas and pkeys convert faithfully") {
    val spec = MysqlDdlConverter.parse(bizDdl)
    assert(spec.schema == "yelp" && spec.table == "business")
    assert(spec.primaryKeys == Seq("id", "name"))

    val byName = spec.columns.map(c => c.name -> c).toMap
    assert(byName("id").avroType == "long" &&
      byName("id").metas.contains("unsigned" -> "true") && !byName("id").nullable)
    assert(byName("name").avroType == "string" &&
      byName("name").metas.contains("maxlen" -> "64"))
    assert(byName("acronym").nullable && byName("acronym").defaultIsNull &&
      byName("acronym").metas.contains("fixlen" -> "3"))
    assert(!byName("review_count").nullable && byName("review_count").avroType == "int")
    assert(byName("rating").metas.toMap == Map(
      "fixed_pt" -> "true", "precision" -> "3", "scale" -> "2"))
    assert(byName("rating").sparkType == DecimalType(3, 2))
    assert(byName("is_open").avroType == "boolean") // tinyint(1) convention
    assert(byName("flavor").metas.contains("enum_values" -> """["plain", "fancy"]"""))
    assert(byName("blob_data").avroType == "bytes" && byName("blob_data").sparkType == BinaryType)
    assert(byName("opened_on").metas.contains("date" -> "true"))
    assert(byName("updated_at").metas.contains("timestamp" -> "true") &&
      byName("updated_at").sparkType == TimestampType)

    // the emitted json is a valid Avro record with union order by default
    val avro = new Schema.Parser().parse(spec.avroSchemaJson)
    assert(avro.getField("acronym").schema().getTypes.get(0).getType == Schema.Type.NULL)
    assert(avro.getField("rating").schema().getTypes.get(1).getType == Schema.Type.DOUBLE)
  }

  test("quotes and backslashes in enum values render valid Avro JSON") {
    val spec = MysqlDdlConverter.parse(
      """CREATE TABLE t (v ENUM('a"b','c\\d','plain') NOT NULL)""")
    val avro = new Schema.Parser().parse(spec.avroSchemaJson) // must not throw
    assert(avro.getField("v").schema().getType == Schema.Type.STRING)
    val rendered = spec.columns.head.metas.toMap.apply("enum_values")
    assert(rendered.contains("a\\\"b"), s"quote must be escaped in: $rendered")
  }

  test("int unsigned promotes to long; signed stays int") {
    val spec = MysqlDdlConverter.parse(
      "CREATE TABLE t (a INT UNSIGNED NOT NULL, b INT NOT NULL, c SMALLINT UNSIGNED)")
    val byName = spec.columns.map(c => c.name -> c).toMap
    assert(byName("a").avroType == "long")
    assert(byName("b").avroType == "int")
    assert(byName("c").avroType == "int") // smallint unsigned still fits int
  }

  test("applyAlter replays ADD/DROP/MODIFY/CHANGE clauses") {
    val old = MysqlDdlConverter.parse(
      "CREATE TABLE t (`a` INT NOT NULL, `b` VARCHAR(10), `c` TEXT)")
    val altered = MysqlDdlConverter.applyAlter(old,
      """ALTER TABLE t ADD COLUMN `d` BIGINT NOT NULL AFTER `a`,
        |DROP COLUMN `c`,
        |MODIFY COLUMN `b` VARCHAR(20) NOT NULL,
        |CHANGE COLUMN `a` `a2` INT NOT NULL;""".stripMargin)
    assert(altered.columns.map(_.name) == Seq("a2", "b", "d"))
    assert(altered.columns.find(_.name == "b").get.metas.contains("maxlen" -> "20"))
    assert(!altered.columns.find(_.name == "b").get.nullable)
  }

  test("columns whose names start with a constraint keyword are kept; real constraints still skip") {
    val spec = MysqlDdlConverter.parse(
      """CREATE TABLE t (
        |  key_id INT NOT NULL,
        |  checksum INT,
        |  index_name VARCHAR(10),
        |  unique_token TEXT,
        |  constraint_kind TEXT,
        |  KEY ix (key_id),
        |  UNIQUE KEY ux (checksum),
        |  CHECK (key_id > 0)
        |)""".stripMargin)
    assert(spec.columns.map(_.name) ==
      Seq("key_id", "checksum", "index_name", "unique_token", "constraint_kind"),
      s"got ${spec.columns.map(_.name)}")
  }

  test("table suffix with parens (PARTITION BY) and quoted parens in defaults parse cleanly") {
    val spec = MysqlDdlConverter.parse(
      """CREATE TABLE t (a INT NOT NULL, c INT NOT NULL)
        |PARTITION BY LIST (c) (PARTITION p0 VALUES IN (1), PARTITION p1 VALUES IN (2));""".stripMargin)
    assert(spec.columns.map(_.name) == Seq("a", "c"))
    // a quoted '(' in a default must not swallow the following column,
    // and enum values containing ')' keep their full value list
    val q = MysqlDdlConverter.parse(
      """CREATE TABLE t (a VARCHAR(10) DEFAULT '(', b INT NOT NULL, e ENUM('a)b','c') NOT NULL)""")
    assert(q.columns.map(_.name) == Seq("a", "b", "e"), s"got ${q.columns.map(_.name)}")
    assert(q.columns.find(_.name == "e").get.metas.toMap
      .apply("enum_values").contains("a)b"))
  }

  test("backslash escapes in literals: split stays aligned, enum/set values decode") {
    // MySQL's own SHOW CREATE TABLE emits \' — a backslash-blind scanner
    // closes the literal at the \', reopens one at the real closing
    // quote, and the next column vanishes into the phantom literal
    val spec = MysqlDdlConverter.parse(
      """CREATE TABLE t (a VARCHAR(10) DEFAULT 'don\'t', b INT NOT NULL, e ENUM('don''t','x\\y','p\%q') NOT NULL)""")
    assert(spec.columns.map(_.name) == Seq("a", "b", "e"),
      s"got ${spec.columns.map(_.name)}")
    // enum values are DECODED: '' → ', \\ → \, \% keeps its backslash
    // (MySQL reserves \% for LIKE); the old regex split 'don''t' in two
    val enumJson =
      spec.columns.find(_.name == "e").get.metas.toMap.apply("enum_values")
    assert(enumJson == """["don't", "x\\y", "p\\%q"]""", enumJson)
  }

  test("named CONSTRAINT ... PRIMARY KEY keeps pkey ordinals") {
    val spec = MysqlDdlConverter.parse(
      """CREATE TABLE t (
        |  a INT NOT NULL,
        |  b VARCHAR(10) NOT NULL,
        |  CONSTRAINT `t_pk` PRIMARY KEY (`b`, `a`),
        |  CONSTRAINT `t_fk` FOREIGN KEY (a) REFERENCES o (id)
        |)""".stripMargin)
    assert(spec.primaryKeys == Seq("b", "a"), s"got ${spec.primaryKeys}")
  }

  test("bit maps: BIT(1) to boolean, wider bit fields to bytes with width meta") {
    val spec = MysqlDdlConverter.parse(
      "CREATE TABLE t (f1 BIT(1) NOT NULL, f2 BIT NOT NULL, f8 BIT(8))")
    def col(n: String) = spec.columns.find(_.name == n).get
    assert(col("f1").avroType == "boolean" && col("f2").avroType == "boolean")
    assert(col("f8").avroType == "bytes" &&
      col("f8").metas.toMap.get("bits").contains("8"))
  }

  test("positional ADD ... AFTER validates; ADD UNIQUE INDEX and DROP CHECK are not column ops") {
    val reg = new SchemaRegistry
    // old + (ADD b AFTER a) => new with b in the middle: consistent, and
    // the shape compare must be order-insensitive (applyAlter appends)
    val entry = reg.registerSchemaFromMysqlStmts(
      "yelp", "pos_tbl",
      newCreateTableStmt = "CREATE TABLE pos_tbl (`a` INT NOT NULL, `b` INT NOT NULL, `c` INT NOT NULL)",
      oldCreateTableStmt = Some("CREATE TABLE pos_tbl (`a` INT NOT NULL, `c` INT NOT NULL)"),
      alterTableStmt = Some("ALTER TABLE pos_tbl ADD COLUMN `b` INT NOT NULL AFTER `a`"))
    assert(entry.schemaId >= 0)
    // index/constraint ALTER clauses pass through without column effects
    val base = MysqlDdlConverter.parse("CREATE TABLE t (a INT NOT NULL, b INT)")
    val after = MysqlDdlConverter.applyAlter(base,
      """ALTER TABLE t ADD UNIQUE INDEX ix (a), ADD FULLTEXT INDEX fx (b),
        |DROP CHECK c1, ADD CHECK (a > 0)""".stripMargin)
    assert(after.columns.map(_.name) == Seq("a", "b"))
  }

  test("registerSchemaFromMysqlStmts validates the (new, old, alter) triple") {
    val reg = new SchemaRegistry
    val entry = reg.registerSchemaFromMysqlStmts(
      "yelp", "business",
      newCreateTableStmt = "CREATE TABLE business (`id` INT NOT NULL PRIMARY KEY, `name` VARCHAR(8) NOT NULL)",
      oldCreateTableStmt = Some("CREATE TABLE business (`id` INT NOT NULL PRIMARY KEY)"),
      alterTableStmt = Some("ALTER TABLE business ADD COLUMN `name` VARCHAR(8) NOT NULL"))
    assert(entry.primaryKeys == Seq("id"))
    assert(reg.getTopicByName(entry.topicName).isDefined)

    // a lying triple is rejected before anything is registered
    val err = intercept[IllegalArgumentException] {
      reg.registerSchemaFromMysqlStmts(
        "yelp", "biz2",
        newCreateTableStmt = "CREATE TABLE biz2 (`id` INT NOT NULL, `extra` TEXT)",
        oldCreateTableStmt = Some("CREATE TABLE biz2 (`id` INT NOT NULL)"),
        alterTableStmt = Some("ALTER TABLE biz2 ADD COLUMN `other` TEXT"))
    }
    assert(err.getMessage.contains("does not produce"))
  }

  test("evolving a mysql source with an added defaulted column stays on-topic") {
    val reg = new SchemaRegistry
    val v1 = reg.registerSchemaFromMysqlStmts("yelp", "user",
      "CREATE TABLE user (`id` INT NOT NULL PRIMARY KEY, `name` TEXT NOT NULL)")
    val v2 = reg.registerSchemaFromMysqlStmts("yelp", "user",
      "CREATE TABLE user (`id` INT NOT NULL PRIMARY KEY, `name` TEXT NOT NULL, `bio` TEXT DEFAULT NULL)")
    // nullable-with-null-default is mutually compatible ⇒ same topic
    assert(v1.topicName == v2.topicName)
    assert(v1.schemaId != v2.schemaId)
  }
}
