package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (north-star requirement).
  *
  * Two paths with the same output contract:
  *  - [[bruteForceTopK]]: exact — probes broadcast against the full
  *    vector table; the table side never shuffles. Right answer, O(N·P)
  *    dot products; the baseline and the verifier for the ANN path.
  *  - [[ivfTopK]]: IVF-style approximate — vectors are bucketed by
  *    centroid (here the fixture's `label` clustering; in production the
  *    assignment comes from k-means over a sample), each probe searches
  *    only its `nprobe` nearest centroids. At 100 TB the centroid table is
  *    a broadcast dim and the scan prunes to nprobe/k of the data —
  *    turning an all-pairs shuffle into a partition-pruned scan.
  *
  * Cosines are rounded before ranking so ordering is reproducible across
  * engines (ties then break on vec_id).
  */
object Similarity {

  /** cosine(a, b) over array<double> columns named `v` and `p`. */
  private val cosineExpr: Column = {
    val d = expr("aggregate(zip_with(v, p, (x, y) -> x * y), 0D, (acc, z) -> acc + z)")
    val nv = expr("sqrt(aggregate(v, 0D, (acc, x) -> acc + x * x))")
    val np = expr("sqrt(aggregate(p, 0D, (acc, x) -> acc + x * x))")
    d / (nv * np)
  }

  /** Exact top-k neighbors per probe. `vectors`: (vec_id, v:array<double>);
    * `probes`: (probe_id, p:array<double>). */
  def bruteForceTopK(vectors: DataFrame, probes: DataFrame, k: Int,
                     roundTo: Int = 4): DataFrame = {
    val scored = vectors.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), round(cosineExpr, roundTo).as("cosine"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Elementwise-mean centroids per cluster: (cluster, c:array<double>).
    * posexplode → per-dimension avg → re-assemble; one shuffle keyed on
    * (cluster, dim) — dimension count bounds the state, not row count. */
  def centroids(vectors: DataFrame, clusterCol: String): DataFrame =
    vectors
      .select(col(clusterCol).as("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("cluster"), col("dim"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col("cluster"))
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("pairs"))
      .select(col("cluster"), expr("transform(pairs, q -> q.m)").as("c"))

  /** IVF search: route each probe to its `nprobe` closest centroids, then
    * exact top-k within those clusters only. */
  def ivfTopK(vectors: DataFrame, clusterCol: String, probes: DataFrame,
              k: Int, nprobe: Int, roundTo: Int = 4): DataFrame = {
    val cents = centroids(vectors.select(col("vec_id"), col("v"), col(clusterCol)), clusterCol)
    // probe -> nprobe nearest centroids (broadcast: k centroids, tiny)
    val probeCent = probes.crossJoin(broadcast(cents))
      .select(col("probe_id"), col("p"), col("cluster"),
        round(expr("aggregate(zip_with(c, p, (x, y) -> x * y), 0D, (acc, z) -> acc + z)") /
          (expr("sqrt(aggregate(c, 0D, (acc, x) -> acc + x * x))") *
            expr("sqrt(aggregate(p, 0D, (acc, x) -> acc + x * x))")), 6).as("ccos"))
    val wc = Window.partitionBy(col("probe_id")).orderBy(col("ccos").desc, col("cluster").asc)
    val routed = probeCent.withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= nprobe)
      .select(col("probe_id"), col("p"), col("cluster"))
    // search only the routed clusters (join prunes the vector side)
    val scored = vectors.select(col("vec_id"), col("v"), col(clusterCol).as("cluster"))
      .join(broadcast(routed), "cluster")
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), round(cosineExpr, roundTo).as("cosine"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
