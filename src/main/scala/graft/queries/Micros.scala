package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE definition of the double→fixed-point-micros conversion used
  * by every money/value aggregation query, paired with its DuckDB
  * oracle fragment.
  *
  * Why guarded: Spark's `floor(double)` lowers to `math.floor(d).toLong`,
  * which silently maps NaN → 0 and ±Infinity → Long.Min/MaxValue — a
  * single corrupt measurement poisons a revenue sum with no trace, and
  * a SQL replay (DuckDB CASTs loudly) cannot even run. At 100 TB,
  * corrupt doubles exist; the honest semantics is NULL = "not
  * convertible", which aggregates skip identically in both engines.
  * The magnitude bound keeps `v * 1e6` inside the long range
  * (|v| < 9.0e12 ⇒ |v·1e6| < 9.0e18 < 2^63−1), so the conversion can
  * never wrap even for finite out-of-range values.
  *
  * Found by the r13 hostile-events oracle-parity wave (NaN/±Inf value
  * rows: Spark summed a silent 0/±2^63 where the oracle errored).
  */
object Micros {
  /** `floor(e · 1e6)` as a long, NULL unless `e` is non-null, non-NaN
    * and |e| < 9.0e12. */
  def micros(c: Column): Column =
    when(c.isNotNull && !isnan(c) && abs(c) < 9.0e12,
      floor(c * 1000000L).cast("long"))

  /** The oracle twin — identical domain, identical result, DuckDB SQL.
    * `e` must be a self-contained SQL expression (parenthesized here). */
  def sql(e: String): String =
    s"CASE WHEN ($e) IS NOT NULL AND NOT isnan($e) AND abs($e) < 9.0e12 " +
      s"THEN CAST(floor(($e) * 1000000) AS BIGINT) END"
}
