package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Cryptographically secure random bytes, one fresh block per row — the
  * CBC-IV source (reference: initialization_vector.py:29, which draws IVs
  * from `os.urandom`).
  *
  * Distinct from [[Uuid4Binary]] on purpose: uuid4 generation rides Spark's
  * `RandomUUIDGenerator` (XORShift — fast, statistically fine for message
  * ids, but its state is recoverable from a few outputs). CBC is only
  * semantically secure when IVs are *unpredictable to an observer*, and the
  * IV is published in cleartext in the meta attribute, so the IV stream
  * must come from a CSPRNG. Each partition holds its own
  * `java.security.SecureRandom` (self-seeded from the platform entropy
  * source; never seeded by us, so no replay mode exists — tests that need
  * replayable IVs pass an explicit `iv` column instead).
  *
  * `instanceTag` only differentiates instances for Catalyst equality (two
  * independently constructed generators must not be common-subexpression'd
  * into one draw); it never influences the byte stream.
  */
case class SecureRandomBinary(numBytes: Int, instanceTag: Long)
    extends LeafExpression with Nondeterministic {

  // fail at plan construction on the driver, not per-row on executors
  // (new byte[-1] would throw NegativeArraySizeException per task)
  require(numBytes >= 0, s"numBytes must be non-negative, got $numBytes")

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "secure_random_binary"

  @transient private[this] var rng: java.security.SecureRandom = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new java.security.SecureRandom()

  override protected def evalInternal(input: InternalRow): Any = {
    val out = new Array[Byte](numBytes)
    rng.nextBytes(out)
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rngName = ctx.addMutableState("java.security.SecureRandom", "secureRng")
    ctx.addPartitionInitializationStatement(
      s"$rngName = new java.security.SecureRandom();")
    ev.copy(
      code = code"""
        final byte[] ${ev.value} = new byte[$numBytes];
        $rngName.nextBytes(${ev.value});""",
      isNull = FalseLiteral)
  }
}
