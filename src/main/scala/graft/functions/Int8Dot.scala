package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact integer dot product over two int8-code arrays as a native
  * Catalyst expression — the per-(probe, candidate) hot path under
  * [[graft.operators.Similarity.int8TopK]]. Quantized search exists to
  * be memory-bandwidth bound (8× less data per vector than float64);
  * the HOF formulation (`aggregate(zip_with(q, pq, (x,y) → x·y), …)`)
  * gives the bandwidth back in boxed per-element lambda dispatch —
  * this expression is one primitive multiply-accumulate loop inside
  * whole-stage codegen (bench: int8_dot_expr vs int8_dot_hof pair
  * rates).
  *
  * Bit-identical semantics to the HOF form, spec-pinned: the
  * accumulation is exact i64 (codes are ≤ 127 in magnitude, so overflow
  * needs a 2⁴⁶-dim vector — structurally impossible), so the result is
  * deterministic across engines and fold orders, which is exactly why
  * the sim_int8_topk oracle holds to the last bit before the one
  * rounded division. Null parity: a null array, a null element, or
  * length-mismatched inputs (zip_with null-pads the shorter side) yield
  * null — the scored row then drops in the ranking's null filter
  * instead of ranking.
  */
case class Int8Dot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "int8_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"int8_dot expects (array<int>, array<int>), got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    Int8Dot.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("i8dot")
      s"""
         |java.lang.Long $res = graft.functions.Int8Dot.compute($a, $b);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Int8Dot =
    copy(left = newLeft, right = newRight)
}

object Int8Dot {
  /** `int8_dot(a, b)`: Σ aᵢ·bᵢ as exact i64; null on length mismatch or
    * any null element (zip_with parity). */
  def int8_dot(a: Column, b: Column): Column =
    GraftBridge.column(Int8Dot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** The fused multiply-accumulate shared by both eval paths. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getInt(i).toLong * b.getInt(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}
