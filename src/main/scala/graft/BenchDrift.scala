package graft

/** Pure drift/anchor math behind [[Bench]]'s round-over-round and
  * best-ever comparisons — extracted so the two failure modes the r16
  * review named are unit-testable without a SparkSession or a bench run:
  * a swallowed baseline-parse error publishing silently-empty drift
  * lists (indistinguishable from "no drift"), and a machine-era ghost
  * anchor that demands a same-day A/B probe re-adjudication every round
  * forever.
  */
private[graft] object BenchDrift {

  /** One probe-adjudicated anchor re-date, read from the committed
    * `bench_anchor_adjudications.jsonl` ledger. `floorSec` /
    * `floorNormSec` are the query's best-of-medians measured on the
    * CURRENT tree during the same-day A/B probe session named by
    * `evidence` (raw, and normalized by that session's calibration
    * slowness); `round` is the round whose probes carry the claim —
    * records from rounds ≤ `round` are superseded by the floor, records
    * from later rounds lower the anchor again as usual. */
  final case class Adjudication(floorSec: Double, floorNormSec: Double,
                                round: Int, evidence: String)

  /** The LAST "queries":{ block of a record line is the published
    * medians map (an attached contended first attempt must be stripped
    * by the caller); one parser serves the round-over-round diff and
    * the best-ever anchor so the two can never read a record
    * differently. Corrupt content parses to an empty map — the caller
    * surfaces that loudly via [[driftWarning]], never silently.
    *
    * Hardened against format drift (r17 review): the block is extracted
    * by BRACE BALANCE, not a naive scan-to-first-`}`, and every
    * top-level entry must parse as a bare number — a future
    * record-format change to struct-valued entries therefore parses to
    * the empty map (→ loud VACUOUS drift_warning), never to a silent
    * subset of whatever entries happened to precede the first nested
    * brace. The one sanctioned partial parse is a record physically
    * TRUNCATED mid-block (the driver's BENCH files are a bounded stdout
    * tail): there the surviving flat numeric prefix is all that exists,
    * and it is parsed as before. */
  def parseQueryMedians(content: String): Map[String, Double] = {
    val marker = "\"queries\":{"
    val qIdx = content.lastIndexOf(marker)
    if (qIdx < 0) Map.empty
    else {
      // brace-balanced extraction of the block body (exclusive of the
      // outer braces); end < 0 = record truncated mid-block
      val start = qIdx + marker.length
      var i = start
      var depth = 1
      var end = -1
      var inStr = false
      var esc = false
      while (i < content.length && end < 0) {
        val c = content.charAt(i)
        if (esc) esc = false
        else if (inStr) {
          if (c == '\\') esc = true else if (c == '"') inStr = false
        } else c match {
          case '"' => inStr = true
          case '{' => depth += 1
          case '}' => depth -= 1; if (depth == 0) end = i
          case _ => ()
        }
        i += 1
      }
      val truncated = end < 0
      val block = content.substring(start, if (truncated) content.length else end)
      // top-level entries only: split at depth-0 commas, require every
      // complete entry to be "name":number
      val entry = "^\\s*\"([a-z0-9_]+)\"\\s*:\\s*(-?[0-9.]+)\\s*$".r
      var d = 0
      var inS = false
      var es = false
      val pieces = scala.collection.mutable.ArrayBuffer.empty[StringBuilder]
      pieces += new StringBuilder
      block.foreach { c =>
        if (es) { es = false; pieces.last.append(c) }
        else if (inS) {
          if (c == '\\') es = true else if (c == '"') inS = false
          pieces.last.append(c)
        } else c match {
          case ',' if d == 0 => pieces += new StringBuilder
          case other =>
            other match {
              case '"' => inS = true
              case '{' | '[' => d += 1
              case '}' | ']' => d -= 1
              case _ => ()
            }
            pieces.last.append(other)
        }
      }
      val entries = pieces.map(_.toString).filter(_.trim.nonEmpty)
      // on a truncated tail the LAST piece may be a cut-off entry — drop
      // it; everything before it must still be flat numeric
      val complete = if (truncated && entries.nonEmpty) entries.init else entries
      val parsed = complete.flatMap {
        case entry(n, v) => v.toDoubleOption.map(n -> _)
        case _ => None
      }
      if (parsed.size != complete.size) Map.empty else parsed.toMap
    }
  }

  /** (flagged names any direction, slowdown-only names, count of
    * queries the baseline could compare at all). One delta pass derives
    * both lists so the published flag list and the mass-drift trigger
    * can never desynchronize on a threshold/guard edit applied to only
    * one of them. */
  def driftDeltas(results: Seq[(String, Double)], prevContent: Option[String])
      : (Seq[String], Seq[String], Int) =
    prevContent.map { content =>
      val prevTimes = parseQueryMedians(content)
      val deltas = results.flatMap { case (name, median) =>
        prevTimes.get(name).collect {
          case p if median > 0 && p > 0 => name -> (median - p) / p
        }
      }
      val flags = deltas.collect { case (n, d) if math.abs(d) > 0.20 => n }
      val slow = deltas.collect { case (n, d) if d > 0.20 => n }
      (flags, slow, deltas.size)
    }.getOrElse((Seq.empty[String], Seq.empty[String], 0))

  /** Loud-vacuity guard (r16 review): a prior record exists but zero of
    * its queries were comparable — a baseline parse bug (corrupt file,
    * reformatted record) would otherwise publish empty drift lists that
    * read exactly like a drift-free round. */
  def driftWarning(priorPresent: Boolean, comparable: Int): Option[String] =
    if (priorPresent && comparable == 0)
      Some("prior bench record present but 0 queries comparable - " +
        "drift lists are VACUOUS (baseline parse failure?), not clean")
    else None

  /** Parse the committed adjudication ledger: one flat JSON object per
    * line carrying sf, query, floor_sec, floor_norm_sec, round and
    * evidence. Lines for another sf, comment lines and malformed lines
    * are skipped (the ledger is hand-audited evidence, not config — a
    * bad line must not take the whole anchor mechanism down). */
  def parseAdjudications(lines: Seq[String], sfName: String)
      : Map[String, Adjudication] = {
    def str(line: String, key: String): Option[String] =
      ("\"" + key + "\":\\s*\"([^\"]+)\"").r.findFirstMatchIn(line)
        .map(_.group(1))
    def num(line: String, key: String): Option[Double] =
      ("\"" + key + "\":\\s*(-?[0-9.]+)").r.findFirstMatchIn(line)
        .flatMap(_.group(1).toDoubleOption)
    lines.flatMap { line =>
      (str(line, "sf"), str(line, "query"), num(line, "floor_sec"),
        num(line, "floor_norm_sec"), num(line, "round"),
        str(line, "evidence")) match {
        case (Some(sf), Some(q), Some(f), Some(fn), Some(r), Some(ev))
            if sf == sfName && f > 0 && fn > 0 =>
          Some(q -> Adjudication(f, fn, r.toInt, ev))
        case _ => None
      }
    }.toMap
  }

  /** Anchor policy (r17): the per-query anchor is the min over all
    * prior CLEAN same-sf records, EXCEPT that a probe-adjudicated
    * machine-era ghost is re-dated — records from rounds at or before
    * the adjudication round contribute `max(their min, floor)` while
    * records from later rounds contribute their raw minima:
    *
    *   anchor = min( max(min over records with round <= adj.round, floor),
    *                 min over records with round  > adj.round )
    *
    * The floor only ever LIFTS an anchor that committed probe evidence
    * (the ledger's `evidence` field — an interleaved same-day A/B run
    * showing the OLD tree itself can no longer reproduce its old
    * number on current hardware) proved unreachable; any later record
    * that genuinely beats the floor lowers the anchor again, so a real
    * future optimization is never clamped. The floor acts ONLY as a
    * supersede for records from rounds ≤ `adj.round` — with no such
    * records present it contributes nothing (r17 review: it would
    * otherwise PULL the anchor below every real post-adjudication
    * record, minting phantom headroom); a query with NO clean record at
    * all still anchors at its probe-measured floor via the floor-only
    * path below. `perRecord` rows are (query, round, value);
    * non-positive values are ignored. */
  def anchorTimes(perRecord: Seq[(String, Int, Double)],
                  adj: Map[String, Adjudication],
                  floorOf: Adjudication => Double): Map[String, Double] = {
    val byQuery = perRecord.filter(_._3 > 0).groupBy(_._1)
    val fromRecords: Map[String, Double] = byQuery.map { case (n, vs) =>
      n -> (adj.get(n) match {
        case Some(a) =>
          val floor = floorOf(a)
          val older = vs.collect { case (_, r, v) if r <= a.round => v }
          val newer = vs.collect { case (_, r, v) if r > a.round => v }
          val lifted =
            if (older.nonEmpty) Seq(math.max(older.min, floor)) else Seq.empty
          (lifted ++ newer).min
        case None => vs.map(_._3).min
      })
    }
    // an adjudicated query with no clean record yet still anchors at its
    // probe-measured floor rather than going unanchored
    val floorOnly = adj.collect {
      case (n, a) if !fromRecords.contains(n) => n -> floorOf(a)
    }
    fromRecords ++ floorOnly
  }
}
