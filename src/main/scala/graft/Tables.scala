package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Each table is a single parquet file per scale factor. At cluster scale
  * these would be partitioned directories; the loaders take the directory so
  * nothing else in the library hard-codes paths. Scans stay lazy so Catalyst
  * pushes projections/filters into the parquet reader (check `PushedFilters`
  * in `.explain("formatted")`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** events.parquet has shipped `ts` as either parquet TIMESTAMP(NANOS)
    * (older generator output — Spark's vectorized reader rejects nanos, so
    * the legacy conf reads them as long and we convert) or TIMESTAMP(MICROS)
    * (current output — arrives as TIMESTAMP_NTZ). Normalize both to the
    * session-UTC TimestampType every downstream query was built against;
    * the fixture's values are µs-aligned so each path is lossless.
    *
    * The NTZ→TimestampType cast below interprets wall-clock values in the
    * SESSION timezone (every NTZ→TZ path in Spark does), so the session tz is
    * pinned to UTC here rather than trusting the entry point to have done
    * it — Verify/Bench/SparkTestBase all set it, but a library user's
    * ad-hoc session in another zone would otherwise silently shift every
    * ts by the zone offset.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
