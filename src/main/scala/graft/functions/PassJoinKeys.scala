package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PassJoin blocking keys (Li, Deng & Feng 2011, "PASS-JOIN: a
  * partition-based method for similarity joins") as a native Catalyst
  * expression — the candidate generator under
  * [[graft.operators.Dedup.editDistancePairs]].
  *
  * Pigeonhole: split the SHORTER string of a pair into `d+1` contiguous
  * segments; `d` edits can corrupt the aligned images of at most `d`
  * of them, so any string within edit distance `d` contains at least
  * one segment EXACTLY, at a start position shifted by at most `d`.
  * So every string emits
  *  - INDEX keys (`probe = false`): its own `d+1` segments, keyed by
  *    (own length, segment index) — the "I am the shorter side" role;
  *  - PROBE keys (`probe = true`): for every candidate shorter-partner
  *    length `m' ∈ [len−d, len]`, the substrings matching the length-m'
  *    segment scheme within the ±d shift window — the "I am the longer
  *    side" role. (2d+1 lengths · (d+1) segments · ≤ 2d+1 shifts —
  *    a small constant per row, never corpus-sized.)
  * A pair within distance `d` ALWAYS collides on at least one encoded
  * key (no false negatives — spec-pinned against brute force); false
  * candidates are killed downstream by the exact Levenshtein verify, so
  * key-encoding collisions ("m:seg:value" with ':' inside value) and
  * the empty-segment keys of strings shorter than d+1 chars only ever
  * ADD candidates, never lose pairs.
  *
  * Segmentation runs on UTF-16 code units (= characters for all of the
  * Basic Multilingual Plane); supplementary-plane text may split a
  * surrogate pair inside a key — harmless for matching BMP-only
  * corpora, documented rather than paid for.
  */
case class PassJoinKeys(child: Expression, d: Int, probe: Boolean)
  extends UnaryExpression {

  require(d >= 1, "edit-distance blocking needs d >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = if (probe) "pass_join_probe" else "pass_join_index"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pass_join keys expect a string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("passJoinKeys", this, classOf[PassJoinKeys].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData) $ref.compute($s);")
  }

  // balanced partition of a length-m string: segment i of d+1 has
  // length base+1 for i < m mod (d+1), else base, starting at
  // i·base + min(i, m mod (d+1))
  private def segLen(m: Int, i: Int): Int =
    m / (d + 1) + (if (i < m % (d + 1)) 1 else 0)
  private def segStart(m: Int, i: Int): Int =
    i * (m / (d + 1)) + math.min(i, m % (d + 1))

  /** The key generator shared by the interpreted and generated paths. */
  def compute(u: UTF8String): GenericArrayData = {
    val s = u.toString
    val m = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    def emit(mm: Int, seg: Int, v: String): Unit =
      out += UTF8String.fromString(s"$mm:$seg:$v")
    if (!probe) {
      var i = 0
      while (i <= d) {
        emit(m, i, s.substring(segStart(m, i), segStart(m, i) + segLen(m, i)))
        i += 1
      }
    } else {
      var mp = math.max(0, m - d)
      while (mp <= m) {
        var i = 0
        while (i <= d) {
          val l = segLen(mp, i)
          if (l == 0) emit(mp, i, "")
          else {
            val st = segStart(mp, i)
            var p = math.max(0, st - d)
            val pMax = math.min(m - l, st + d)
            // dedupe within the tiny window (shifts can coincide)
            var last: String = null
            while (p <= pMax) {
              val v = s.substring(p, p + l)
              if (v != last) { emit(mp, i, v); last = v }
              p += 1
            }
          }
          i += 1
        }
        mp += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): PassJoinKeys =
    copy(child = newChild)
}

object PassJoinKeys {
  /** Index-role keys: the string's own d+1 segments. */
  def pass_join_index(s: Column, d: Int): Column =
    GraftBridge.column(PassJoinKeys(GraftBridge.expression(s), d, probe = false))

  /** Probe-role keys: segment-scheme substrings for every candidate
    * shorter-partner length, within the ±d shift window. */
  def pass_join_probe(s: Column, d: Int): Column =
    GraftBridge.column(PassJoinKeys(GraftBridge.expression(s), d, probe = true))
}
