package graft.tools

import java.nio.file.{FileSystems, Files, Path, Paths}

import scala.jdk.CollectionConverters._

import graft.functions.AvroCodec
import graft.schema.SchemaRegistry

/** Schema bootstrapper: register `.avsc` Avro schemas and `.sql` Redshift
  * `CREATE TABLE` files from glob patterns into the embedded registry
  * (reference: tools/bootstrapper.py:37-530, glob expansion
  * tools/_glob_util.py). Driver-side file IO — not a Spark job
  * (SURVEY §2.1 S11).
  *
  * Registration is idempotent (identical schemas return the existing
  * entry), so re-running over the same tree is safe.
  */
object Bootstrapper {

  private val GlobChars = "*?[{"

  /** Expand glob patterns to regular files (recursive `**` supported),
    * deduped and sorted for deterministic registration order. */
  def filesMatching(patterns: Seq[String]): Seq[Path] =
    patterns.flatMap(expand).distinct.sortBy(_.toString)

  private def expand(pattern: String): Seq[Path] = {
    val hasGlob = pattern.exists(c => GlobChars.indexOf(c.toInt) >= 0)
    val p = Paths.get(pattern)
    if (!hasGlob) return if (Files.isRegularFile(p)) Seq(p) else Seq.empty
    val segs = (0 until p.getNameCount).map(p.getName(_).toString)
    val globIx = segs.indexWhere(s => s.exists(c => GlobChars.indexOf(c.toInt) >= 0))
    val base = Paths.get((if (p.isAbsolute) "/" else "") + segs.take(globIx).mkString("/"))
    if (!Files.isDirectory(base)) return Seq.empty
    val matcher = FileSystems.getDefault.getPathMatcher("glob:" + pattern)
    val stream = Files.walk(base)
    try stream.iterator().asScala
      .filter(f => Files.isRegularFile(f) && matcher.matches(f)).toList
    finally stream.close()
  }

  /** Register one `.avsc` file; namespace/source come from the schema's
    * own namespace and record name. */
  def registerAvsc(reg: SchemaRegistry, path: Path,
                   containsPii: Boolean = false): SchemaRegistry#SchemaEntry = {
    val json = new String(Files.readAllBytes(path), "UTF-8")
    val parsed = AvroCodec.parse(json)
    val ns = Option(parsed.getNamespace).getOrElse("default")
    reg.registerSchema(ns, parsed.getName, json, containsPii)
  }

  /** Register one `.sql` file: DDL → Avro via the dialect-appropriate
    * converter; namespace/source = schema/table name. MySQL DDL is
    * recognized by its surface syntax (backticks, ENGINE=, UNSIGNED,
    * AUTO_INCREMENT); anything else parses as Redshift, falling back to
    * MySQL for the dialect-ambiguous remainder. */
  def registerSql(reg: SchemaRegistry, path: Path): SchemaRegistry#SchemaEntry = {
    val ddl = new String(Files.readAllBytes(path), "UTF-8")
    val spec = parseSqlDdl(ddl)
    reg.registerSchema(spec.schema, spec.table, spec.avroSchemaJson)
  }

  /** MySQL surface markers by whole word — a raw substring match routed
    * a Redshift table with an `unsigned_delta` column to the MySQL
    * parser. */
  private val MysqlMarkerRe =
    "(?is)`|\\bENGINE\\s*=|\\bUNSIGNED\\b|\\bAUTO_INCREMENT\\b".r

  /** Dialect sniffing is a heuristic, so BOTH branches fall back to the
    * other parser. Both attempts run the converters in STRICT mode (any
    * body entry that is neither a recognized constraint nor a parseable
    * column throws, as does a zero-column parse): registration is the
    * one place a lenient parse is dangerous — a misrouted dialect could
    * otherwise "succeed" by silently dropping the columns it can't
    * read, registering a partial schema while swallowing the primary
    * parser's informative error. */
  private[graft] def parseSqlDdl(ddl: String): DdlModel.TableSpec = {
    def nonEmpty(t: DdlModel.TableSpec): DdlModel.TableSpec =
      if (t.columns.isEmpty)
        throw new IllegalArgumentException("no columns parsed from DDL")
      else t
    def attempt(primary: String => DdlModel.TableSpec,
                secondary: String => DdlModel.TableSpec): DdlModel.TableSpec =
      try nonEmpty(primary(ddl))
      catch {
        case e: IllegalArgumentException =>
          try nonEmpty(secondary(ddl))
          catch { case _: IllegalArgumentException => throw e }
      }
    if (MysqlMarkerRe.findFirstIn(ddl).isDefined)
      attempt(MysqlDdlConverter.parse(_, strict = true),
        RedshiftDdlConverter.parse(_, strict = true))
    else attempt(RedshiftDdlConverter.parse(_, strict = true),
      MysqlDdlConverter.parse(_, strict = true))
  }

  /** Bootstrap every `.avsc`/`.sql` file matching the patterns; other
    * extensions are skipped. */
  def bootstrap(reg: SchemaRegistry, patterns: Seq[String]): Seq[SchemaRegistry#SchemaEntry] =
    filesMatching(patterns).flatMap { p =>
      val name = p.toString
      if (name.endsWith(".sql")) Some(registerSql(reg, p))
      else if (name.endsWith(".avsc")) Some(registerAvsc(reg, p))
      else None
    }
}
