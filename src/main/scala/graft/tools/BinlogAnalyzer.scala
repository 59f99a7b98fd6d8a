package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `mysqlbinlog --verbose` text → `{timestamp, statement_type, table}` rows
  * (reference: tools/binlog_analyzer.py:33-98 — SURVEY §2.1 S9).
  *
  * Reference semantics, re-expressed as a windowed DataFrame pipeline:
  *  - a row-event header line (`#yymmdd hh:mm:ss server id N …
  *    Write_rows|Update_rows|Delete_rows`) sets the current event
  *    timestamp, which carries forward until the next header;
  *  - each `### INSERT INTO|UPDATE|DELETE FROM <table>` line emits one
  *    output row stamped with the carried header timestamp.
  *
  * Scale shape: binlogs are sequential per file, so the carry-forward is
  * `last(_, ignoreNulls)` over a window **partitioned by file** and
  * ordered by line number — parallelism is one task per binlog file, the
  * natural unit (a global ordering window would serialize the world).
  */
object BinlogAnalyzer {

  val HeaderRe: String =
    "#(\\d+) +(\\d+:\\d+:\\d+) +server +id +\\d+.*(Update_rows|Write_rows|Delete_rows)"
  val StatementRe: String = "### (DELETE FROM|INSERT INTO|UPDATE) (.+)"

  private def statementType(verb: Column): Column =
    when(verb === "INSERT INTO", "insert")
      .when(verb === "UPDATE", "update")
      .otherwise("delete") // reference statement_to_type map

  /** Parse binlog text lines. `lines` must carry (fileCol, lineNoCol,
    * lineCol); output is one row per row-event statement:
    * (file, line_no, timestamp, statement_type, table_name). */
  def parse(lines: DataFrame, fileCol: String, lineNoCol: String,
            lineCol: String): DataFrame = {
    val line = col(lineCol)
    val w = Window.partitionBy(col(fileCol)).orderBy(col(lineNoCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    // `H` (not `HH`): mysqlbinlog prints hours with %2d, so morning
    // events read `#210305  4:25:30` — a strict two-digit HH nulled
    // every 0:00-9:59 header (silently carrying the previous header's
    // timestamp forward) and killed the task outright in ANSI mode.
    // try_to_timestamp keeps a malformed-but-regex-matching header a
    // null (skipped by the carry-forward) instead of an ANSI task death.
    val headerTs = when(line.rlike(HeaderRe),
      unix_timestamp(try_to_timestamp(
        concat_ws(" ",
          regexp_extract(line, HeaderRe, 1),
          regexp_extract(line, HeaderRe, 2)),
        lit("yyMMdd H:mm:ss"))))
    val verb = regexp_extract(line, StatementRe, 1)
    lines
      .withColumn("__hts", last(headerTs, ignoreNulls = true).over(w))
      .filter(regexp_extract(line, StatementRe, 1) =!= "")
      .select(
        col(fileCol),
        col(lineNoCol),
        col("__hts").as("timestamp"),
        statementType(verb).as("statement_type"),
        regexp_extract(line, StatementRe, 2).as("table_name"))
  }
}
