package graft
import graft.core.Envelope
import graft.functions.AvroCodec
import graft.schema.AvroConversions
object SerdeProbe {
  def main(args: Array[String]): Unit = {
    val n = 1000000
    val envelopeSchema = AvroCodec.parse(Envelope.avroSchemaJson)
    // build one framed envelope
    val payload = Array.fill[Byte](30)(3)
    val rec = new org.apache.avro.generic.GenericData.Record(envelopeSchema)
    rec.put(0, new org.apache.avro.generic.GenericData.Fixed(envelopeSchema.getField("uuid").schema(), Array.fill[Byte](16)(7)))
    rec.put(1, new org.apache.avro.generic.GenericData.EnumSymbol(envelopeSchema.getField("message_type").schema(), "create"))
    rec.put(2, Int.box(1)); rec.put(3, java.nio.ByteBuffer.wrap(payload))
    rec.put(7, Int.box(1700000000))
    val framed = AvroCodec.frameBinary(AvroCodec.encode(rec, Envelope.avroSchemaJson))
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$label%-22s ${n / secs}%,12.0f rows/s")
    }
    time("unframe only") { var i = 0; while (i < n) { AvroCodec.unframe(framed); i += 1 } }
    time("unframe+decode") { var i = 0; while (i < n) {
      AvroCodec.decode(AvroCodec.unframe(framed), Envelope.avroSchemaJson, Envelope.avroSchemaJson); i += 1 } }
    time("full (toCatalyst)") { var i = 0; while (i < n) {
      AvroConversions.toCatalyst(AvroCodec.decode(AvroCodec.unframe(framed), Envelope.avroSchemaJson, Envelope.avroSchemaJson), envelopeSchema); i += 1 } }
  }
}
