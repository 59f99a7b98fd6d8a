package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array — near-duplicate fingerprinting where
  * Hamming distance ≈ cosine distance of the token multiset (north-star
  * dedup family, alongside MinHash in [[graft.operators.Dedup]]).
  *
  * Native Catalyst expression: per-token hashing runs on the UTF8String's
  * backing bytes via Murmur3 with no per-row allocation beyond the 64-int
  * vote array. Pair with `bit_count(a ^ b)` (builtin, codegen'd) for
  * Hamming distance — candidate filtering at scale is then a cheap integer
  * op, e.g. bucketing on 16-bit sub-bands of the fingerprint.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[ArrayData]))

  // Whole-stage codegen via the same reference-object pattern as
  // CosineArgmax: the generated code carries one object reference and
  // calls the identical primitive loop the interpreted path runs, so the
  // child subtree stays inside WholeStageCodegen (vs CodegenFallback's
  // per-row InternalRow materialization + boxed tree eval).
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHash64", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  /** The vote loop shared by the interpreted and generated paths. */
  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        val h1 = Murmur3_x86_32.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes(), 41)
        val h2 = Murmur3_x86_32.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes(), 42)
        val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))

  /** Hamming distance between two fingerprints (pure builtins, codegen'd). */
  def hamming(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))
}
