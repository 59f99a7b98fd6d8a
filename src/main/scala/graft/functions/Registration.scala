package graft.functions

import org.apache.spark.sql.SparkSession

import graft.schema.SchemaRegistry

/** SQL surface for the custom expressions: after `registerAll`, plain
  * `spark.sql` queries can call pack_envelope / unpack_envelope /
  * encode_payload / decode_payload / simhash64 — the engine is usable from
  * pure SQL, not just the Scala DSL.
  */
object Registration {

  /** Register session-scoped SQL functions. `registry` backs
    * decode_payload's schema_id dispatch; encode_payload/decode_payload
    * take the writer/reader schema id as a literal second/third argument.
    */
  def registerAll(spark: SparkSession, registry: SchemaRegistry): Unit = {
    val fr = spark.sessionState.functionRegistry
    val snapshot = registry.snapshot

    fr.createOrReplaceTempFunction("pack_envelope",
      exprs => PackEnvelope(exprs.head, ascii = false), "scala_udf")
    fr.createOrReplaceTempFunction("pack_envelope_ascii",
      exprs => PackEnvelope(exprs.head, ascii = true), "scala_udf")
    fr.createOrReplaceTempFunction("unpack_envelope",
      exprs => UnpackEnvelope(exprs.head), "scala_udf")
    fr.createOrReplaceTempFunction("encode_payload",
      exprs => EncodePayload(exprs.head, literalString(exprs(1), "encode_payload schema")),
      "scala_udf")
    fr.createOrReplaceTempFunction("decode_payload",
      exprs => DecodePayload(exprs.head, exprs(1), snapshot,
        literalInt(exprs(2), "decode_payload reader schema id")), "scala_udf")
    fr.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64(exprs.head), "scala_udf")
    fr.createOrReplaceTempFunction("rolling_min_hash",
      exprs => RollingMinHash64(exprs.head,
        literalInt(exprs(1), "rolling_min_hash window")), "scala_udf")
    fr.createOrReplaceTempFunction("rolling_fingerprint",
      exprs => RollingFingerprint64(exprs.head,
        literalInt(exprs(1), "rolling_fingerprint window")), "scala_udf")
    // mmr_select(ids, rel_ppm, vecs, n, lambda_ppm) — the greedy
    // diversity cut callable from pure SQL (n and λ as int literals;
    // the expressions carrying array/matrix constructor state — PqAdc,
    // CosineArgmax, MatVec… — stay DSL-only by design)
    fr.createOrReplaceTempFunction("mmr_select",
      exprs => MmrSelect(exprs.head, exprs(1), exprs(2),
        literalInt(exprs(3), "mmr_select n"),
        literalInt(exprs(4), "mmr_select lambda_ppm").toLong), "scala_udf")
  }

  private def literalString(e: org.apache.spark.sql.catalyst.expressions.Expression,
                            what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null => v.toString
    case other => throw new IllegalArgumentException(s"$what must be a string literal, got $other")
  }

  private def literalInt(e: org.apache.spark.sql.catalyst.expressions.Expression,
                         what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }
}
