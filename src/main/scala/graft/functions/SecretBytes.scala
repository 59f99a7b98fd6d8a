package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, DataType}

/** A constant byte string whose VALUE never appears in the query plan —
  * the carrier for key material fed to `aes_encrypt`/`aes_decrypt`.
  *
  * `lit(key)` would put the key into the plan as a `Literal` node,
  * rendered verbatim by `df.explain()`, the Spark UI SQL tab, and
  * persisted event logs (Spark's literal redaction does not cover
  * function arguments) — anyone with UI or history-server access could
  * read the AES key in cleartext. This expression carries the bytes as
  * an object reference instead: `foldable = false` stops constant
  * folding from collapsing it back into a Literal, every rendering of
  * the node prints only the caller-chosen label, and the generated code
  * references the object, never an inline constant.
  *
  * The bytes ride inside [[SecretBytes.Holder]], an opaque non-product
  * wrapper, because TreeNode renders CONSTRUCTOR ARGUMENTS on every
  * path — `toString`/`sql` are overridable, but `toJSON`
  * (`queryExecution.logical.toJSON`, plan-change JSON logging) walks
  * `productIterator` directly and serializes a raw `Array[Byte]` arg as
  * a JSON byte array. A holder that is neither a product, a Spark type,
  * nor an array falls through every branch of that serializer to
  * `JNull`, and its own `toString` is the label, so no rendering path
  * reaches the bytes.
  *
  * Deterministic and row-independent, so it composes anywhere a literal
  * would. Two instances with different holders are never
  * common-subexpression'd into each other (the holder equality is
  * reference identity).
  */
case class SecretBytes(key: SecretBytes.Holder)
    extends LeafExpression {

  override def nullable: Boolean = false
  override def foldable: Boolean = false // never collapse into a Literal
  override def dataType: DataType = BinaryType
  override def prettyName: String = "secret_bytes"
  override def toString: String = s"secret_bytes(${key.label})"
  override def sql: String = s"secret_bytes('${key.label}')"

  override def eval(input: InternalRow): Any = key.bytes

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("secretBytes", key.bytes, "byte[]")
    ev.copy(code = code"final byte[] ${ev.value} = $ref;",
      isNull = FalseLiteral)
  }
}

object SecretBytes {

  /** Opaque key-material carrier: deliberately NOT a case class (no
    * productIterator for tree-node JSON to walk), equality is reference
    * identity, and every string rendering is the label. Serializable
    * because non-codegen operator paths (codegen disabled, Janino
    * fallback) ship the expression tree in the task closure. */
  final class Holder(val bytes: Array[Byte], val label: String)
      extends Serializable {
    override def toString: String = s"secret_bytes($label)"
  }

  /** The secret as a binary column; only `label` ever renders. */
  def secret(bytes: Array[Byte], label: String): Column =
    GraftBridge.column(SecretBytes(new Holder(bytes, label)))

  def secret(utf8: String, label: String): Column =
    secret(utf8.getBytes(java.nio.charset.StandardCharsets.UTF_8), label)
}
