package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's drift/anchor math ([[BenchDrift]]) — the two r16-review
  * failure modes, pinned without a bench run:
  *  1. a corrupt/unparseable prior record must surface as a LOUD
  *     drift_warning, never as silently-empty flag lists that read like
  *     a drift-free round;
  *  2. a probe-adjudicated machine-era ghost anchor is re-dated by the
  *     committed ledger, supersedes only records up to its round, and
  *     never clamps a genuinely faster later record.
  */
class BenchDriftSpec extends AnyFunSuite {

  private def record(qs: (String, Double)*): String =
    qs.map { case (n, v) => s""""$n":$v""" }
      .mkString("""{"metric":"total","queries":{""", ",", """}, "sf":"x"}""")

  test("driftDeltas: healthy prior record yields flags and comparable count") {
    val prev = record("a" -> 1.0, "b" -> 1.0, "c" -> 1.0)
    val (flags, slow, n) = BenchDrift.driftDeltas(
      Seq("a" -> 1.5, "b" -> 0.5, "c" -> 1.05), Some(prev))
    assert(n == 3)
    assert(flags.toSet == Set("a", "b"), "both directions flag at >20%")
    assert(slow == Seq("a"), "the mass-drift trigger sees slowdowns only")
  }

  test("driftDeltas: corrupt prior record -> 0 comparable, and driftWarning is LOUD") {
    val (flags, slow, n) = BenchDrift.driftDeltas(
      Seq("a" -> 1.5), Some("""{"metric":"total","garbage":true}"""))
    assert(flags.isEmpty && slow.isEmpty && n == 0)
    val w = BenchDrift.driftWarning(priorPresent = true, comparable = 0)
    assert(w.isDefined && w.get.toLowerCase.contains("vacuous"),
      s"a prior record with zero comparable queries must publish a warning, got $w")
  }

  test("driftWarning: absent when no prior record, or when something compared") {
    assert(BenchDrift.driftWarning(priorPresent = false, comparable = 0).isEmpty)
    assert(BenchDrift.driftWarning(priorPresent = true, comparable = 5).isEmpty)
  }

  test("parseQueryMedians reads the LAST queries block (contended attempt stripped upstream)") {
    val c = """{"queries":{"a":9.0},"retry":true,"queries":{"a":1.25,"b":0.5}}"""
    assert(BenchDrift.parseQueryMedians(c) == Map("a" -> 1.25, "b" -> 0.5))
  }

  test("parseQueryMedians: struct-valued entry -> loud empty parse, never a silent subset") {
    // a future record-format change (nested object inside the queries
    // block) must not silently truncate to the entries before the first
    // nested brace (r17 review) — empty map → VACUOUS drift_warning
    val nested =
      """{"queries":{"a":1.0,"b":{"median":2.0,"spread":0.1},"c":3.0},"sf":"x"}"""
    assert(BenchDrift.parseQueryMedians(nested).isEmpty,
      "a nested-brace queries block must parse to empty (loud), not a subset")
    val w = BenchDrift.driftWarning(priorPresent = true, comparable = 0)
    assert(w.isDefined, "the empty parse surfaces as the VACUOUS warning")
  }

  test("parseQueryMedians: nested braces inside the block do not spill entries") {
    // entries nested INSIDE a struct must not leak into the medians map
    val nested = """{"queries":{"a":{"x":9.0}},"sf":"x"}"""
    assert(BenchDrift.parseQueryMedians(nested).isEmpty)
  }

  test("parseQueryMedians: record truncated mid-block keeps the surviving flat prefix") {
    // the driver's BENCH files are a bounded stdout tail — a physically
    // cut-off record parses the complete entries before the cut, with
    // the severed final entry dropped, as the pre-hardening parser did
    val truncated = """{"metric":"total","queries":{"a":1.25,"b":0.5,"c":7."""
    assert(BenchDrift.parseQueryMedians(truncated) == Map("a" -> 1.25, "b" -> 0.5))
  }

  test("parseQueryMedians: braces inside string values neither close nor open the block") {
    val c = """{"queries":{"a":1.0,"b":2.0},"note":"a } inside { a string"}"""
    assert(BenchDrift.parseQueryMedians(c) == Map("a" -> 1.0, "b" -> 2.0))
  }

  test("parseAdjudications: same-sf lines parse, other-sf and malformed lines skip") {
    val lines = Seq(
      """{"sf": "sf0.1", "query": "q_ghost", "floor_sec": 1.941, "floor_norm_sec": 1.8189, "round": 15, "evidence": "ab_probe_r16.jsonl", "note": "x"}""",
      """{"sf": "sf0.01", "query": "q_other", "floor_sec": 0.5, "floor_norm_sec": 0.4, "round": 15, "evidence": "e"}""",
      """not json at all""",
      """{"sf": "sf0.1", "query": "q_negative", "floor_sec": -1, "floor_norm_sec": 1, "round": 15, "evidence": "e"}""")
    val adj = BenchDrift.parseAdjudications(lines, "sf0.1")
    assert(adj.keySet == Set("q_ghost"))
    val a = adj("q_ghost")
    assert(a.floorSec == 1.941 && a.floorNormSec == 1.8189 &&
      a.round == 15 && a.evidence == "ab_probe_r16.jsonl")
  }

  test("anchorTimes: ghost anchor from a superseded round is lifted to the floor") {
    // the r16 shape: r14's 1.4863 is a machine-era ghost; probes set the
    // floor at 1.941 superseding rounds <= 15; the r16 record read 2.57
    val adj = Map("q" -> BenchDrift.Adjudication(1.941, 1.8, 15, "e"))
    val anchors = BenchDrift.anchorTimes(
      Seq(("q", 13, 1.5002), ("q", 14, 1.4863), ("q", 16, 2.5706)),
      adj, _.floorSec)
    assert(math.abs(anchors("q") - 1.941) < 1e-9,
      s"anchor must lift to the probe floor, got ${anchors("q")}")
  }

  test("anchorTimes: a later record that beats the floor lowers the anchor (no clamp)") {
    val adj = Map("q" -> BenchDrift.Adjudication(1.941, 1.8, 15, "e"))
    val anchors = BenchDrift.anchorTimes(
      Seq(("q", 14, 1.4863), ("q", 17, 1.2)), adj, _.floorSec)
    assert(math.abs(anchors("q") - 1.2) < 1e-9,
      "a genuine post-adjudication optimization must not be clamped at the floor")
  }

  test("anchorTimes: post-supersede records below the current reading keep the anchor") {
    // the r16 record (round > supersede boundary) read 0.9376 while the
    // probe floor was 1.0256 — the same-era RECORD wins, not the floor
    val adj = Map("q" -> BenchDrift.Adjudication(1.0256, 0.95, 15, "e"))
    val anchors = BenchDrift.anchorTimes(
      Seq(("q", 13, 0.7322), ("q", 16, 0.9376)), adj, _.floorSec)
    assert(math.abs(anchors("q") - 0.9376) < 1e-9)
  }

  test("anchorTimes: un-adjudicated queries keep the plain min; floor-only queries anchor at the floor") {
    val adj = Map("only_floor" -> BenchDrift.Adjudication(0.5, 0.45, 15, "e"))
    val anchors = BenchDrift.anchorTimes(
      Seq(("plain", 13, 2.0), ("plain", 14, 1.0), ("plain", 16, 3.0)),
      adj, _.floorSec)
    assert(math.abs(anchors("plain") - 1.0) < 1e-9)
    assert(math.abs(anchors("only_floor") - 0.5) < 1e-9)
  }

  test("anchorTimes: floor never pulls the anchor below post-adjudication records") {
    // r17 review: with ONLY post-adjudication records present, the floor
    // must not act as an anchor candidate of its own — min(floor, newer)
    // with floor < newer.min would mint phantom headroom no real record
    // ever measured
    val adj = Map("q" -> BenchDrift.Adjudication(0.8, 0.75, 15, "e"))
    val anchors = BenchDrift.anchorTimes(
      Seq(("q", 16, 1.2), ("q", 17, 1.3)), adj, _.floorSec)
    assert(math.abs(anchors("q") - 1.2) < 1e-9,
      s"with no superseded records the newer min alone anchors, got ${anchors("q")}")
  }

  test("anchorTimes ignores non-positive sentinels") {
    val anchors = BenchDrift.anchorTimes(
      Seq(("q", 14, -1.0), ("q", 15, 0.8)), Map.empty, _.floorSec)
    assert(math.abs(anchors("q") - 0.8) < 1e-9)
  }
}
