package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Greedy maximal-marginal-relevance selection (Carbonell & Goldstein
  * 1998) as a native Catalyst expression — the diversity-aware
  * candidate cut under `Similarity.mmrSelect`: from one query's
  * candidate list (ids, relevance scores, embedding vectors, packed as
  * three parallel arrays on a single row), repeatedly pick
  * argmax  λ·rel − (1−λ)·max_{s∈chosen} sim(c, s)
  * until `n` are chosen, so near-duplicates of an already-selected
  * candidate are deferred in favor of coverage. The loop is inherently
  * sequential per query — exactly what a per-row primitive expression
  * expresses and a distributed operator cannot — while queries stay
  * embarrassingly parallel across rows.
  *
  * Exact integer contract (cross-engine deterministic, replayed by the
  * sim_mmr_select recursive-CTE oracle): relevance arrives as integer
  * ppm; each pairwise cosine rounds to 6 dp exactly as Spark's `round`
  * does (`BigDecimal.valueOf(x).setScale(6, HALF_UP)`) and scales to an
  * integer `sim_ppm`; the selection score is the RAW i64
  * `λ_ppm·rel_ppm − (1000000−λ_ppm)·max_sim_ppm` — deliberately never
  * divided, because Spark's `div` truncates toward zero while DuckDB's
  * `//` floors, and MMR scores go negative. Ties break to the lower id.
  * An empty chosen set contributes max_sim_ppm = 0 (the oracle's
  * COALESCE), so step 1 is the pure-relevance argmax for any λ > 0.
  * Score magnitudes stay in-range for |rel_ppm| ≤ 10¹² (1e6·1e12 < 2⁶³).
  *
  * Degenerate candidates DROP before selection (never silently rank):
  * a null id/rel/vector entry, a vector whose length disagrees with the
  * first valid candidate's, a null vector element, a zero-norm
  * vector (cosine undefined), or a |rel_ppm| beyond the documented
  * 10¹² bound (λ_ppm·rel would overflow i64 and silently corrupt the
  * argmax). Mismatched top-level array lengths or a
  * null input array yield null. Selection is input-order independent
  * (argmax + id tie-break), so the unordered `collect_list` feeding it
  * needs no sort.
  *
  * Cost per query row: O(k·n·dim) multiply-adds (k candidates; the
  * max-sim term updates incrementally after each pick — no k×k sim
  * matrix materializes).
  */
case class MmrSelect(first: Expression, second: Expression, third: Expression,
                     n: Int, lambdaPpm: Long)
  extends TernaryExpression {

  require(n > 0, "mmr_select needs n > 0")
  require(lambdaPpm >= 0L && lambdaPpm <= 1000000L,
    s"lambdaPpm must be in [0, 1000000], got $lambdaPpm")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "mmr_select"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _),
            ArrayType(ArrayType(DoubleType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"mmr_select expects (array<bigint> ids, array<bigint> rel_ppm, " +
          s"array<array<double>> vecs), got $other")
    }

  override def nullSafeEval(ids: Any, rels: Any, vecs: Any): Any =
    compute(ids.asInstanceOf[ArrayData], rels.asInstanceOf[ArrayData],
      vecs.asInstanceOf[ArrayData])

  // Whole-stage codegen: one call into the same fused greedy loop the
  // interpreted path runs; the boxed result only carries the null cases.
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mmrSelect", this, classOf[MmrSelect].getName)
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val res = ctx.freshName("mmrRes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res = $ref.compute($a, $b, $c);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res;
         |}
       """.stripMargin
    })
  }

  /** The fused greedy loop shared by the interpreted and generated paths. */
  def compute(ids: ArrayData, rels: ArrayData, vecs: ArrayData): ArrayData = {
    val k0 = ids.numElements()
    if (rels.numElements() != k0 || vecs.numElements() != k0) return null
    // validate + unpack candidates (degenerates drop, see doc) in ONE
    // pass: a candidate is well-formed when id/rel/vec are non-null, rel
    // is in ppm bounds, no vector element is null, and the squared norm
    // is finite and > 0 (an Infinity element gives s2 = Inf, whose
    // cosine is Inf/Inf = NaN and the exact-decimal ppm conversion would
    // throw NumberFormatException — one poisoned row must drop, never
    // kill the task; NaN elements already drop: NaN > 0.0 is false).
    // The accepted dimensionality then anchors to the SMALLEST-ID
    // WELL-FORMED candidate: collect_list order is shuffle-dependent, so
    // a first-seen anchor made the drop set nondeterministic — and
    // anchoring on merely non-null candidates let an INVALID stray
    // (zero-norm, out-of-range rel) carrying the wrong dim veto every
    // well-formed candidate into an empty selection. Ids are unique per
    // query, so min-id over well-formed candidates is order-free.
    val vid = new Array[Long](k0)
    val rel = new Array[Long](k0)
    val vec = new Array[Array[Double]](k0)
    val nrm = new Array[Double](k0)
    var m = 0
    var i = 0
    while (i < k0) {
      if (!ids.isNullAt(i) && !rels.isNullAt(i) && !vecs.isNullAt(i) &&
          rels.getLong(i) >= -MmrSelect.MaxRelPpm &&
          rels.getLong(i) <= MmrSelect.MaxRelPpm) {
        val va = vecs.getArray(i)
        val d = va.numElements()
        var ok = true
        val arr = new Array[Double](d)
        var s2 = 0.0
        var j = 0
        while (ok && j < d) {
          if (va.isNullAt(j)) ok = false
          else { arr(j) = va.getDouble(j); s2 += arr(j) * arr(j); j += 1 }
        }
        if (ok && s2 > 0.0 && java.lang.Double.isFinite(s2)) {
          vid(m) = ids.getLong(i)
          rel(m) = rels.getLong(i)
          vec(m) = arr
          nrm(m) = math.sqrt(s2)
          m += 1
        }
      }
      i += 1
    }
    var dim = -1
    var anchorId = Long.MaxValue
    var p = 0
    while (p < m) {
      if (vid(p) < anchorId) { anchorId = vid(p); dim = vec(p).length }
      p += 1
    }
    // keep only the anchor dimensionality (compact in place)
    var k = 0
    var c0 = 0
    while (c0 < m) {
      if (vec(c0).length == dim) {
        vid(k) = vid(c0); rel(k) = rel(c0); vec(k) = vec(c0); nrm(k) = nrm(c0)
        k += 1
      }
      c0 += 1
    }
    val take = math.min(n, k)
    val out = new Array[Long](take)
    val chosen = new Array[Boolean](k)
    // Long.MinValue = "no chosen yet" → scores as 0 (the oracle COALESCE);
    // a real max can be negative, so 0 is not a valid floor
    val maxSim = Array.fill(k)(Long.MinValue)
    var step = 0
    while (step < take) {
      var best = -1
      var bestScore = Long.MinValue
      var c = 0
      while (c < k) {
        if (!chosen(c)) {
          val simTerm = if (maxSim(c) == Long.MinValue) 0L else maxSim(c)
          val score = lambdaPpm * rel(c) - (1000000L - lambdaPpm) * simTerm
          // `best < 0` first: the very first candidate always seeds the
          // argmax, so the vid(best) tie-break can never index -1 (a
          // score of exactly Long.MinValue would otherwise tie the
          // sentinel bestScore before any pick exists)
          if (best < 0 || score > bestScore ||
              (score == bestScore && vid(c) < vid(best))) {
            best = c
            bestScore = score
          }
        }
        c += 1
      }
      out(step) = vid(best)
      chosen(best) = true
      c = 0
      while (c < k) {
        if (!chosen(c)) {
          val s = simPpm(vec(c), nrm(c), vec(best), nrm(best))
          if (maxSim(c) == Long.MinValue || s > maxSim(c)) maxSim(c) = s
        }
        c += 1
      }
      step += 1
    }
    new GenericArrayData(out)
  }

  // cosine → 6-dp round (Spark `round` semantics) → integer ppm
  private def simPpm(a: Array[Double], na: Double,
                     b: Array[Double], nb: Double): Long = {
    var dot = 0.0
    var j = 0
    while (j < a.length) { dot += a(j) * b(j); j += 1 }
    java.math.BigDecimal.valueOf(dot / (na * nb))
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .movePointRight(6).longValueExact()
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
                                                 newSecond: Expression,
                                                 newThird: Expression): MmrSelect =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object MmrSelect {
  /** The documented |rel_ppm| contract bound: beyond this,
    * λ_ppm·rel_ppm can exceed i64 (1e6·1e12 < 2⁶³ < 1e6·1e13). */
  val MaxRelPpm: Long = 1000000000000L

  /** `mmr_select(ids, rel_ppm, vecs, n, λ_ppm)`: the ids of the n
    * greedy MMR picks, in selection order. */
  def mmr_select(ids: Column, relPpm: Column, vecs: Column,
                 n: Int, lambdaPpm: Long): Column =
    GraftBridge.column(MmrSelect(GraftBridge.expression(ids),
      GraftBridge.expression(relPpm), GraftBridge.expression(vecs),
      n, lambdaPpm))
}
