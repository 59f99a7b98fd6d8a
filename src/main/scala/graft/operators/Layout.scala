package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout — multi-column data skipping for scans
  * that filter on EITHER of two keys.
  *
  * A single-column sort gives parquet min/max pruning on that column
  * and nothing on any other; interleaving the bits of two columns and
  * range-partitioning + sorting on the interleaved value makes every
  * partition (and every parquet row group inside it) a small rectangle
  * in (x, y) space — both columns' min/max spans shrink to ~√cells, so
  * a predicate on either column skips most of a 100 TB table's files.
  * The write costs one range shuffle, paid once, like
  * [[Bucketing.writeBucketed]]'s hash layout (bucketing serves
  * equality/join on ONE key; z-order serves range scans on several).
  *
  * The interleave is the classic magic-number bit spread — pure integer
  * ops, so the whole z-value stays inside whole-stage codegen and the
  * DuckDB oracle replays it with the same shift/mask ladder.
  */
object Layout {

  /** Spread the low 16 bits of `c` to the even bit positions 0,2,…,30. */
  private def spread16(c: Column): Column = {
    val m0 = c.bitwiseAND(lit(0xFFFFL))
    val m1 = (m0.bitwiseOR(shiftleft(m0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val m2 = (m1.bitwiseOR(shiftleft(m1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = (m2.bitwiseOR(shiftleft(m2, 2))).bitwiseAND(lit(0x33333333L))
    (m3.bitwiseOR(shiftleft(m3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit values: x on even bits, y on odd. */
  def zValue2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Re-layout `df` along the z-curve of (xCol, yCol): range-partition
    * into `nPartitions` contiguous curve segments and sort inside each,
    * so both columns cluster within every partition/row group. Follow
    * with a plain parquet write — the min/max stats do the skipping. */
  def zorderRange(df: DataFrame, xCol: String, yCol: String,
                  nPartitions: Int): DataFrame = {
    val z = zValue2(col(xCol), col(yCol)).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(nPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
