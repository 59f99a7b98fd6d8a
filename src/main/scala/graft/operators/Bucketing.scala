package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table layout — the pre-shuffle co-location lever for joins
  * that recur on one key.
  *
  * A fact-fact join (lineitem ⋈ orders; message ⋈ message replay joins
  * in the reference's refresh flows) shuffles BOTH sides on the key
  * every time it runs. Writing each side once as a bucketed table
  * (`bucketBy(n, key)` + `saveAsTable`) bakes `hashpartitioning(key, n)`
  * into the file layout: every later join/aggregation on that key reads
  * the buckets as already-distributed partitions and plans NO exchange
  * on either side — the shuffle is paid once at write time and amortized
  * over every subsequent query. At 100 TB this is the difference between
  * re-moving the whole fact table per query and a scan-local merge join;
  * it composes with bucket pruning (an equality predicate on the bucket
  * key reads 1/n of the files — `SelectedBucketsCount` in the scan).
  *
  * Spark-native counterpart of the reference's keyspace partitioning
  * (topic partitions keyed by primary key — `data_pipeline/producer.py`
  * routes by key so downstream consumers see co-located streams).
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed (and in-bucket
    * sorted) by `key`. The `repartition` puts each bucket's rows in ONE
    * task so each bucket lands as one file — without it every write
    * task emits a file per bucket it happens to hold rows for, and a
    * 1000-task writer × 1024 buckets is a million-file table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int): Unit = {
    val spark = df.sparkSession
    // drop both the catalog entry and any orphaned location: with the
    // in-memory catalog a fresh session forgets the table but the
    // warehouse directory persists, and CTAS refuses to reuse it
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // the orphan location must come from the CATALOG's default-path rule
    // (warehouse/<db>.db/<table> outside the default database) — a
    // hand-built warehouse/<table> path pointed at the DEFAULT database's
    // namespace, deleting an unrelated managed table's files there while
    // missing the real stale directory
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.repartition(nBuckets, col(key))
      .write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Inner-join two tables bucketed on their join keys with matching
    * bucket counts. The merge hint pins the sort-merge strategy the
    * bucketed layout feeds exchange-free (at test scale the optimizer
    * would otherwise broadcast the small side — which ignores the
    * layout this operator exists to exploit; at 100 TB neither side
    * broadcasts and SMJ is what the optimizer picks anyway). */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    leftKey: String, rightKey: String): DataFrame = {
    // side-qualified keys: two tables bucketed on an identically NAMED
    // key (the common case) made bare col(key) === col(key) ambiguous
    // and the operator unusable exactly where it matters most
    val l = spark.table(leftTable).alias("__bl")
    val r = spark.table(rightTable).hint("merge").alias("__br")
    l.join(r, col(s"__bl.$leftKey") === col(s"__br.$rightKey"))
  }
}
