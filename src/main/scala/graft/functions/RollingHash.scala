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
  * exactly; a spec pins that identity. Iterates Unicode code points
  * (surrogate pairs fused), matching the per-character `ascii()` path for
  * all text, supplementary planes included.
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
    val cps = RollingFingerprint64.codePoints(input.toString)
    val n = cps.length
    if (n < window) return null
    // first window: plain stepwise fold
    var h = 0L
    var i = 0
    while (i < window) { h = (h * B + cps(i)) % M; i += 1 }
    var min = h
    // roll: remove leading term, shift, append
    while (i < n) {
      val out = cps(i - window).toLong
      h = ((h + M - (out * bPow) % M) % M * B + cps(i)) % M
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

/** Full rolling-hash fingerprint summary — `struct<n_windows, min_hash,
  * n_distinct>` in ONE O(len) pass — the native replacement for composing
  * `size`/`array_min`/`size∘array_distinct` over
  * [[graft.operators.TextAnalysis.rollingHashes]]' materialized array.
  *
  * The HOF formulation is the cross-engine oracle-replay artifact, not a
  * production path: it re-derives each character via `substr(i, 1)` (an
  * O(i) scan on UTF-8 bytes, so O(len²) just to read the characters),
  * recomputes every window from scratch (O(len·w) boxed array folds), and
  * runs interpreted because HOFs don't codegen — measured ~174 docs/s vs
  * ~67k docs/s for the native rolling loop. This expression does the true
  * Rabin–Karp update once per character and counts distinct window hashes
  * with an open-addressed long set sized to the window count, inside
  * whole-stage codegen via the reference-object pattern.
  *
  * Semantics are pinned to the HOF/oracle pair exactly: same constants
  * (B = 257, M = 1e9+7), same stepwise-mod arithmetic, and the character
  * stream is UNICODE CODE POINTS — `ascii(substr(i, 1))` in the HOF and
  * `unicode(text[i])` in the DuckDB oracle both yield code points, so
  * supplementary-plane text hashes identically in all three formulations
  * (a spec pins the identity on astral input). Strings shorter than the
  * window yield (0, null, 0), matching `size([]) / array_min([]) /
  * size(array_distinct([]))` on the HOF's empty array.
  */
case class RollingFingerprint64(child: Expression, window: Int)
  extends UnaryExpression {

  require(window >= 1, "window must be positive")

  override def dataType: DataType = RollingFingerprint64.outputType
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_fingerprint"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_fingerprint expects string, got $other")
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

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rollingFp", this,
      classOf[RollingFingerprint64].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  /** Single-pass fingerprint; shared by the interpreted and generated
    * paths. Never null for non-null input. */
  def compute(input: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val cps = RollingFingerprint64.codePoints(input.toString)
    val n = cps.length
    if (n < window)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, null, 0L))
    val nw = n - window + 1
    // open-addressed set of window hashes (values < M, sentinel -1);
    // capacity = next power of two ≥ 2·nw keeps load factor ≤ 0.5.
    // LONG arithmetic: nw * 2 overflowed Int for a ~600M-char document,
    // leaving cap at 4 — after 4 distinct hashes the full table made the
    // linear probe spin forever (a hung task, not even a failure)
    var cap = 4L
    while (cap < nw.toLong * 2L) cap <<= 1
    require(cap <= (1L << 30),
      s"document too large for rolling-hash set: $nw windows")
    val table = new Array[Long](cap.toInt)
    java.util.Arrays.fill(table, -1L)
    val mask = cap.toInt - 1
    var distinct = 0L

    var h = 0L
    var i = 0
    while (i < window) { h = (h * B + cps(i)) % M; i += 1 }
    var min = h
    var idx = ((h * 0x9E3779B97F4A7C15L) >>> 33).toInt & mask
    while (table(idx) != -1L && table(idx) != h) idx = (idx + 1) & mask
    if (table(idx) == -1L) { table(idx) = h; distinct += 1 }

    while (i < n) {
      val out = cps(i - window).toLong
      h = ((h + M - (out * bPow) % M) % M * B + cps(i)) % M
      if (h < min) min = h
      idx = ((h * 0x9E3779B97F4A7C15L) >>> 33).toInt & mask
      while (table(idx) != -1L && table(idx) != h) idx = (idx + 1) & mask
      if (table(idx) == -1L) { table(idx) = h; distinct += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nw.toLong, min, distinct))
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint64 =
    copy(child = newChild)
}

object RollingFingerprint64 {
  val outputType: StructType = StructType(Seq(
    StructField("n_windows", LongType, nullable = false),
    StructField("min_hash", LongType, nullable = true),
    StructField("n_distinct", LongType, nullable = false)))

  def rolling_fingerprint(text: Column, window: Int = 8): Column =
    GraftBridge.column(RollingFingerprint64(GraftBridge.expression(text), window))

  /** Decode UTF-16 to code points — one int per character, surrogate
    * pairs fused — so the hash stream matches `ascii(substr(i, 1))` /
    * DuckDB `unicode(text[i])` beyond the BMP. */
  private[functions] def codePoints(s: String): Array[Int] = {
    val n = s.length
    val out = new Array[Int](n)
    var i = 0
    var k = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      out(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    if (k == n) out else java.util.Arrays.copyOf(out, k)
  }
}
