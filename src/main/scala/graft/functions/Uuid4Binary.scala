package graft.functions

import org.apache.spark.TaskContext
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.RandomUUIDGenerator
import org.apache.spark.sql.types.{BinaryType, DataType}

/** 16-byte uuid4 generation as a whole-stage-codegen'd expression — the
  * reference's headline performance surface (reference: _fast_uuid.py:36-181:
  * libuuid over FFI lifted message construction from ~25k/s to ~185k/s,
  * uuid4 generation alone to ~385k/s).
  *
  * Spark-native equivalent: a `Nondeterministic` leaf expression holding a
  * per-partition `RandomUUIDGenerator` (version/variant bits set per RFC
  * 4122), emitted as raw 16-byte binary exactly as the envelope's
  * `fixed(16)` uuid field wants it — no string formatting, no parsing, no
  * per-row allocation beyond the output array.
  *
  * Seeding has two modes:
  *  - `perTaskEntropy = true` (the unseeded default): the task attempt id
  *    is mixed into the seed, so every task of every micro-batch draws a
  *    fresh stream — a streaming query that re-initializes the expression
  *    per batch can never replay uuids across batches (message identity
  *    must be globally unique; a replayed stream would make consumer-side
  *    uuid dedup silently drop distinct messages).
  *  - `perTaskEntropy = false` (explicit seed): fully deterministic per
  *    (seed, partition, row ordinal) for replayable tests and benchmarks.
  */
case class Uuid4Binary(seed: Long, perTaskEntropy: Boolean)
    extends LeafExpression with Nondeterministic {

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "uuid4_binary"

  @transient private[this] var gen: RandomUUIDGenerator = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    gen = RandomUUIDGenerator(
      Uuid4Binary.taskSeed(seed, partitionIndex, perTaskEntropy))

  override protected def evalInternal(input: InternalRow): Any =
    Uuid4Binary.toBytes(gen.getNextUUID())

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val genName = ctx.addMutableState(
      "org.apache.spark.sql.catalyst.util.RandomUUIDGenerator", "uuid4Gen")
    ctx.addPartitionInitializationStatement(
      s"$genName = new org.apache.spark.sql.catalyst.util.RandomUUIDGenerator(" +
        s"graft.functions.Uuid4Binary.taskSeed(${seed}L, partitionIndex, $perTaskEntropy));")
    val u = ctx.freshName("uuid")
    ev.copy(
      code = code"""
        final java.util.UUID $u = $genName.getNextUUID();
        final byte[] ${ev.value} = new byte[16];
        long ${u}_m = $u.getMostSignificantBits();
        long ${u}_l = $u.getLeastSignificantBits();
        for (int ${u}_i = 0; ${u}_i < 8; ${u}_i++) {
          ${ev.value}[${u}_i] = (byte) (${u}_m >>> (56 - 8 * ${u}_i));
          ${ev.value}[8 + ${u}_i] = (byte) (${u}_l >>> (56 - 8 * ${u}_i));
        }""",
      isNull = FalseLiteral)
  }
}

object Uuid4Binary {

  /** Seed for one task's generator. With `perTaskEntropy`, the globally
    * unique task attempt id is mixed in (golden-ratio multiplier spreads
    * consecutive ids across the seed space); falls back to nanoTime when
    * no TaskContext exists (driver-side evaluation). */
  def taskSeed(seed: Long, partitionIndex: Int, perTaskEntropy: Boolean): Long = {
    val base = seed + partitionIndex
    if (!perTaskEntropy) base
    else {
      val attempt = Option(TaskContext.get()) match {
        case Some(tc) => tc.taskAttemptId()
        case None => System.nanoTime()
      }
      base ^ (attempt * 0x9E3779B97F4A7C15L)
    }
  }

  def toBytes(u: java.util.UUID): Array[Byte] = {
    val out = new Array[Byte](16)
    val m = u.getMostSignificantBits
    val l = u.getLeastSignificantBits
    var i = 0
    while (i < 8) {
      out(i) = (m >>> (56 - 8 * i)).toByte
      out(8 + i) = (l >>> (56 - 8 * i)).toByte
      i += 1
    }
    out
  }
}
