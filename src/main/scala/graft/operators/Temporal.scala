package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators: point-in-time (as-of) joins.
  *
  * An as-of join attaches to every left row the most recent right row with
  * the same key whose timestamp does not exceed the left row's timestamp —
  * the lookup every feature store, slowly-changing-dimension read, and
  * trade/quote alignment performs. Spark has no native as-of join; the
  * naive encodings both fail at scale:
  *
  *  - `left JOIN right ON key AND r.ts <= l.ts` + window/aggregate
  *    materializes every (left, earlier-right) pair — O(|L|·|R|/keys)
  *    intermediate rows, quadratic on hot keys;
  *  - a broadcast range join only works while one side fits in memory.
  *
  * This implementation is the linear union form: tag both sides, union,
  * sort within key by (ts, side, tie), and carry the last-seen right
  * payload forward with a running `last(ignoreNulls)` window. One hash
  * shuffle on the key, within-partition sort, O(|L|+|R|) rows end to end,
  * constant per-row state — the same shape at sf0.001 and at 100 TB
  * (skewed keys salt the same way any window does: split the key, carry
  * boundary state). Right rows order before left rows at equal timestamps,
  * so the match is inclusive (`r.ts <= l.ts`); ties among right rows at
  * the same (key, ts) resolve to the greatest `tieCol` — deterministic on
  * any engine.
  */
object Temporal {

  /** Backward as-of join. Returns every `left` row (all columns) plus
    * `right`'s `payloadCols` from the matched row — null when the key has
    * no right row at or before the left timestamp. `tieCol` breaks
    * equal-timestamp ties among right rows (greatest wins); it must be
    * non-null.
    */
  def asofJoin(left: DataFrame, right: DataFrame, leftKey: String,
               rightKey: String, leftTs: String, rightTs: String,
               tieCol: String, payloadCols: Seq[String]): DataFrame = {
    val clash = payloadCols.toSet intersect left.columns.toSet
    require(clash.isEmpty,
      s"payloadCols ${clash.mkString(", ")} collide with left columns; " +
        "rename on either side before the join (output keeps both sets by name)")
    val leftCols = left.columns.toSeq
    val l = left.select(
      col(leftKey).as("__k"), col(leftTs).as("__ts"),
      lit(null).cast(right.schema(tieCol).dataType).as("__tie"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        payloadCols.map(c => right.schema(c)))).as("__p"),
      lit(1).as("__side"))
    val r = right
      // a null right timestamp matches NOTHING (SQL: r.ts <= l.ts is
      // never true for null r.ts) — but nulls sort FIRST under the
      // ascending window order, so an unfiltered null-ts row's payload
      // would be carried forward into every left row of its key
      .filter(col(rightTs).isNotNull)
      .select(
        col(rightKey).as("__k"), col(rightTs).as("__ts"), col(tieCol).as("__tie"),
        lit(null).cast(left.select(leftCols.map(col): _*).schema).as("__l"),
        struct(payloadCols.map(col): _*).as("__p"),
        lit(0).as("__side"))
    // right rows sort before left rows at equal ts (inclusive match); among
    // right rows at equal (key, ts) the greatest tie sorts last, so the
    // running last() picks it
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = r.unionByName(l)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val out = leftCols.map(c => col("__l").getField(c).as(c)) ++
      payloadCols.map(c => col("__m").getField(c).as(c))
    matched.select(out: _*)
  }

  /** Bucketized range (interval) join: every `left` row whose `tsCol`
    * falls inside a `right` interval `[startCol, endCol)` with matching
    * `eqKeys` — "events during an incident window", "reads overlapping a
    * compaction", the time-containment join Spark has no native operator
    * for.
    *
    * The naive encodings fail at scale the same way as-of's do: a non-equi
    * `l.ts BETWEEN r.start AND r.end` join plans as a nested-loop over
    * every key group (quadratic on hot keys), and broadcasting only works
    * while one side fits in memory. Here both sides map to time buckets of
    * `bucketMs`: an interval explodes to the buckets it covers (bounded by
    * its length / bucketMs + 1 — size the bucket near the TYPICAL interval
    * length so the fan-out stays O(1)), a point carries exactly one
    * bucket, and the match becomes a plain equi-join on eqKeys + bucket
    * followed by the exact range filter. One hash shuffle per side, no
    * nested loop anywhere, and each qualifying pair appears EXACTLY once
    * (a point's single bucket meets each covering interval once — no
    * dedup pass).
    *
    * Inverted/empty intervals (`end <= start`) are dropped before the
    * explode: they can never match (`ts >= start && ts < end` is
    * unsatisfiable), and without the guard a corrupted row with `end`
    * near 0 and a large `start` would make `sequence` auto-step -1 and
    * generate a DESCENDING bucket range — millions of bucket rows (or a
    * sequence-length failure) for a row the exact filter discards anyway.
    *
    * Hot (key, bucket) pairs — one incident window covering the bucket
    * every point lands in — put the whole point group in one join task.
    * `saltBuckets > 1` shards them: each point gets a deterministic salt
    * in [0, saltBuckets) hashed off its timestamp, and each interval
    * bucket row replicates across ALL salts, so the join key becomes
    * (eqKeys, bucket, salt) and a hot group splits across saltBuckets
    * tasks. Interval-side fan-out multiplies by saltBuckets — pay it
    * only when the point side is skewed; output is identical (spec-pinned).
    *
    * `tsCol`/`startCol`/`endCol` are epoch-milli longs; output = all left
    * columns + all right columns (names must not clash apart from
    * eqKeys).
    */
  def rangeJoin(left: DataFrame, tsCol: String, right: DataFrame,
                startCol: String, endCol: String, eqKeys: Seq[String],
                bucketMs: Long, saltBuckets: Int = 1): DataFrame = {
    require(bucketMs > 0, "bucketMs must be positive")
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    // same reserved-name discipline as saltedJoin: silently overwriting
    // (then dropping) a caller's __bucket/__salt column would make it
    // vanish from the output with no error
    Seq("__bucket", "__salt").foreach { rc =>
      require(!left.columns.contains(rc) && !right.columns.contains(rc),
        s"column name `$rc` is reserved by rangeJoin; rename it first")
    }
    val ib = right
      .filter(col(endCol) > col(startCol))
      .withColumn("__bucket", explode(sequence(
        expr(s"$startCol div $bucketMs"), expr(s"($endCol - 1) div $bucketMs"))))
    val lb = left.withColumn("__bucket", expr(s"$tsCol div $bucketMs"))
    val (lbs, ibs, keys) =
      if (saltBuckets == 1) (lb, ib, eqKeys :+ "__bucket")
      else (
        lb.withColumn("__salt",
          pmod(xxhash64(col(tsCol)), lit(saltBuckets.toLong)).cast("int")),
        ib.withColumn("__salt",
          explode(sequence(lit(0), lit(saltBuckets - 1)))),
        eqKeys ++ Seq("__bucket", "__salt"))
    lbs.join(ibs, keys)
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket", "__salt")
  }
}
