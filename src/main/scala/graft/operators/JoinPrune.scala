package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomMightContainLong.bloom_might_contain

/** Join pruning: cut the big side of a join down BEFORE the shuffle.
  *
  * The shape the reference reaches for when replaying a topic against a
  * registry subset (membership checks in
  * `data_pipeline/consumer.py:274-286` are driver-side set lookups): at
  * Spark scale the same idea is a semi join, and at 100 TB the dominant
  * cost of that semi join is shuffling the fact side. A bloom filter of
  * the build-side keys is a few MB for hundreds of millions of keys at
  * 1% fpp — it rides along in the task binary and eliminates the
  * non-matching fraction of the fact table inside the scan stage, so
  * only candidate rows (matches + fpp·non-matches) ever reach the
  * exchange. Spark's own runtime row-level filtering
  * (`spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`) does this
  * opportunistically for shuffle joins it can see through; this operator
  * is the explicit, composable form — the sketch can be built once and
  * reused across many queries/batches against the same dimension set,
  * which the optimizer's per-query runtime filter cannot do.
  */
object JoinPrune {

  /** Build a reusable bloom sketch of `keyCol` (integral) from the build
    * side. `expectedNumItems` sizes the sketch; overshooting wastes a few
    * bits/key, undershooting inflates the realized fpp — pass the
    * build-side row-count estimate you'd pass a join-size hint.
    */
  def bloomOfKeys(build: DataFrame, keyCol: String,
                  expectedNumItems: Long, fpp: Double = 0.01)
      : org.apache.spark.util.sketch.BloomFilter =
    build.stat.bloomFilter(keyCol, expectedNumItems, fpp)

  /** Exact left-semi join with bloom pre-pruning of the probe side.
    *
    * Three stages: (1) one pass over the (small) build side folds its
    * keys into a bloom sketch — a mergeable aggregation, bounded memory
    * per task; (2) the probe side filters on the sketch inside its scan
    * stage — definite non-matches (the overwhelming majority in the
    * selective case) never shuffle; (3) the surviving candidates run the
    * ordinary exact semi join, which kills the sketch's false positives.
    * The result is bit-identical to `probe.join(build, key, "left_semi")`
    * — the bloom stage only ever removes rows the exact join would also
    * remove — so the oracle is the plain EXISTS query.
    */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame,
                    probeKey: String, buildKey: String,
                    expectedNumItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = bloomOfKeys(build, buildKey, expectedNumItems, fpp)
    probe
      .filter(bloom_might_contain(col(probeKey), bf))
      .join(build.select(col(buildKey)),
        col(probeKey) === col(buildKey), "left_semi")
  }

  /** Salted equi-join for skewed keys — the manual form of AQE's skew
    * split, usable when the skew is KNOWN up front (from
    * [[Frequency.skewStats]]) or when AQE can't see it (first run, no
    * shuffle statistics yet, or a key so hot one split still overflows).
    *
    * A plain `fact ⋈ dim` on a key owning 10% of a 100 TB table sends
    * 10 TB to ONE reducer. Salting shards it: each fact row gets a
    * deterministic salt in [0, nSalts) hashed off `saltOn` (a
    * high-cardinality disambiguator — the row's id/offset), the dim side
    * replicates every row across ALL salts (explode of a `nSalts`-element
    * range — dims are small; replication is the price of leveling), and
    * the join keys on (key, salt): the hot key's rows now land on
    * `nSalts` reducers. Result is bit-identical to the plain join —
    * every (fact, dim) match pairs under exactly one salt value.
    * Returns fact columns + the dim's non-key columns (same contract as
    * `fact.join(dim, keys)`).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltOn: String, nSalts: Int): DataFrame = {
    require(nSalts >= 1, "nSalts must be >= 1")
    // reserved across ALL columns, not just the keys: a non-key __salt
    // data column would be silently overwritten by the salt, violating
    // the bit-identical-to-plain-join contract
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "__salt is reserved by saltedJoin; rename the column first")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(col(saltOn)), lit(nSalts.toLong)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedFact.join(saltedDim, keys :+ "__salt").drop("__salt")
  }
}
