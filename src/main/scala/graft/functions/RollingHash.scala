package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp rolling min-hash fingerprint as a native Catalyst expression
  * — the O(len) fast path for [[graft.operators.TextAnalysis.rollingHashes]]'
  * min-hash summary.
  *
  * The column-expression formulation recomputes each window's polynomial
  * from scratch (O(len·w) with per-window array slices — the price of
  * cross-engine oracle replay); this expression does the true rolling
  * update — drop the leading char's `c·B^(w−1)` term, shift, add the new
  * char — one multiply-add per character and a single min register, no
  * allocation beyond one String per row. Same constants (B = 257,
  * M = 1e9+7) and the identical stepwise-mod arithmetic, so
  * `rolling_min_hash(text, w) == array_min(rollingHashes(text, w))` holds
  * exactly; a spec pins that identity. Iterates UTF-16 code units, which
  * equals the per-character `ascii()` path for BMP text.
  *
  * Returns null for strings shorter than the window (no windows exist).
  */
case class RollingMinHash64(child: Expression, window: Int)
  extends UnaryExpression {

  require(window >= 1, "window must be positive")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_min_hash"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_min_hash expects string, got $other")
    }

  private val B = 257L
  private val M = 1000000007L
  // B^(w-1) mod M — the weight of the window's leading character
  private val bPow: Long = {
    var p = 1L
    var i = 1
    while (i < window) { p = (p * B) % M; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  // Whole-stage codegen via the reference-object pattern (see
  // CosineArgmax): one object call into the shared rolling loop. The
  // output is nullable even for non-null input (short strings), so the
  // generated stanza unboxes the result and flips the null flag itself.
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rollingMinHash", this,
      classOf[RollingMinHash64].getName)
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("rmh")
      s"""
         |java.lang.Long $r = $ref.compute($v);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })
  }

  /** The rolling loop shared by the interpreted and generated paths;
    * null when the string is shorter than the window. */
  def compute(input: UTF8String): java.lang.Long = {
    val s = input.toString
    val n = s.length
    if (n < window) return null
    // first window: plain stepwise fold
    var h = 0L
    var i = 0
    while (i < window) { h = (h * B + s.charAt(i)) % M; i += 1 }
    var min = h
    // roll: remove leading term, shift, append
    while (i < n) {
      val out = s.charAt(i - window)
      h = ((h + M - (out * bPow) % M) % M * B + s.charAt(i)) % M
      if (h < min) min = h
      i += 1
    }
    java.lang.Long.valueOf(min)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash64 =
    copy(child = newChild)
}

object RollingMinHash64 {
  def rolling_min_hash(text: Column, window: Int = 8): Column =
    GraftBridge.column(RollingMinHash64(GraftBridge.expression(text), window))
}
