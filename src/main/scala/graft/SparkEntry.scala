package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CurationOps, EnvelopeOps, LlmOps, Relational, RetrievalOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented SURVEY §2 operator to a
  * DataFrame builder over a scale-factor directory; `oracleSql` carries the
  * DuckDB-equivalent SQL for the hash-compare gate. Non-SQL-expressible
  * operators (envelope serde, minhash, …) appear in `queries` only.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.qRegionRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.defs ++ EnvelopeOps.defs ++ LlmOps.defs ++ CurationOps.defs ++
      RetrievalOps.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ EnvelopeOps.oracles ++ LlmOps.oracles ++
      CurationOps.oracles ++ RetrievalOps.oracles
}
