package graft.sources.v2

import java.util.regex.Pattern

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

import graft.sources.{IcebergSnapshot, IcebergTableLoader, IcebergWap}

/** SQL ref-management DDL Spark's grammar lacks — the Iceberg
  * SQL-extensions pattern (a delegating parser injected via
  * [[graft.api.GraftExtensions]]):
  * {{{
  *   ALTER TABLE graft.db.t CREATE BRANCH audit
  *   ALTER TABLE graft.db.t CREATE TAG release [AS OF VERSION <id>]
  *   ALTER TABLE graft.db.t DROP BRANCH audit
  *   ALTER TABLE graft.db.t DROP TAG release
  *   ALTER TABLE graft.db.t FAST FORWARD audit   -- publish: main ↞ branch
  * }}}
  * With these plus the `graft.wap.branch` session conf (INSERT stages
  * on the branch) and `VERSION AS OF '<branch>'` (audit reads), the
  * FULL write-audit-publish cycle runs in pure SQL — no API calls.
  *
  * The table must be named CATALOG-QUALIFIED (`<catalog>.<ns…>.<t>`)
  * where `<catalog>` is a registered [[GraftIcebergCatalog]]; the
  * command resolves the table path from the catalog's warehouse conf
  * directly, so the parser needs no analyzer support. Everything else
  * delegates verbatim to Spark's parser. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    refCommand(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parsePlanWithParameters(sqlText: String,
      parameters: ParameterContext): LogicalPlan =
    refCommand(sqlText).getOrElse(
      delegate.parsePlanWithParameters(sqlText, parameters))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  // `ALTER TABLE <ident> CREATE|DROP BRANCH|TAG <name> [AS OF VERSION <id>]`
  private val RefDdl = Pattern.compile(
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+(CREATE|DROP)\s+(BRANCH|TAG)\s+""" +
      """([\w.-]+|`[^`]+`)\s*(?:AS\s+OF\s+VERSION\s+(\d+)\s*)?;?\s*""")
  // `ALTER TABLE <ident> FAST FORWARD <branch>`
  private val FastForward = Pattern.compile(
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+FAST\s+FORWARD\s+""" +
      """([\w.-]+|`[^`]+`)\s*;?\s*""")

  private def unquote(s: String): String =
    if (s.startsWith("`") && s.endsWith("`")) s.substring(1, s.length - 1)
    else s

  /** Split a multipart identifier on dots, tokenizing backtick-quoted
    * segments FIRST — `cat.`my.db`.t` is (cat, my.db, t), not
    * (cat, `my, db`, t); a doubled backtick inside quotes escapes a
    * literal one (standard SQL quoting, what Spark's own
    * parseMultipartIdentifier does). */
  private def parts(ident: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var quoted = false
    while (i < ident.length) {
      val c = ident.charAt(i)
      if (quoted) {
        if (c == '`' && i + 1 < ident.length && ident.charAt(i + 1) == '`') {
          cur += '`'; i += 1
        } else if (c == '`') quoted = false
        else cur += c
      } else c match {
        case '`' => quoted = true
        case '.' => out += cur.result(); cur.clear()
        case other => cur += other
      }
      i += 1
    }
    out += cur.result()
    out.result()
  }

  private[v2] def refCommand(sqlText: String): Option[LogicalPlan] = {
    val m = RefDdl.matcher(sqlText)
    if (m.matches())
      return Some(GraftRefCommand(parts(m.group(1)),
        m.group(2).toUpperCase, m.group(3).toLowerCase,
        unquote(m.group(4)), Option(m.group(5)).map(_.toLong)))
    val f = FastForward.matcher(sqlText)
    if (f.matches())
      return Some(GraftRefCommand(parts(f.group(1)), "FASTFORWARD",
        "branch", unquote(f.group(2)), None))
    None
  }
}

/** One ref-management operation, resolved and executed at run time
  * against the catalog-qualified table's warehouse path. */
case class GraftRefCommand(tableParts: Seq[String], op: String,
    refType: String, refName: String,
    asOfVersion: Option[Long]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    require(tableParts.length >= 2,
      s"${tableParts.mkString(".")}: ref DDL needs a catalog-qualified " +
        "table name (<catalog>.<namespace...>.<table>)")
    val catalogName = tableParts.head
    val impl = spark.conf.getOption(s"spark.sql.catalog.$catalogName")
      .getOrElse(throw new IllegalArgumentException(
        s"$catalogName is not a registered catalog " +
          s"(spark.sql.catalog.$catalogName is unset)"))
    require(impl == classOf[GraftIcebergCatalog].getName,
      s"catalog $catalogName is $impl, not a graft-iceberg catalog")
    val warehouse = spark.conf.get(s"spark.sql.catalog.$catalogName.warehouse")
    val path = (warehouse +: tableParts.tail).mkString("/")
    val conf = spark.sparkContext.hadoopConfiguration
    val hint = new org.apache.hadoop.fs.Path(path, "metadata/version-hint.text")
    require(org.apache.hadoop.fs.FileSystem.get(hint.toUri, conf).exists(hint),
      s"no Iceberg table at ${tableParts.mkString(".")} ($path)")
    val tdef = IcebergTableLoader.load(path, conf)
    op match {
      case "CREATE" =>
        val sid = asOfVersion.getOrElse(
          IcebergSnapshot.currentSnapshotId(path, conf).getOrElse(
            throw new IllegalStateException(
              s"${tableParts.mkString(".")} has no committed snapshot " +
                "to ref — insert data first or pass AS OF VERSION")))
        IcebergSnapshot.createRef(tdef, path, refName, sid, refType, conf)
      case "DROP" =>
        IcebergSnapshot.dropRef(tdef, path, refName, conf)
      case "FASTFORWARD" =>
        // publish: fast-forward main to the staged branch's head
        // (refuses if main advanced past the fork — see IcebergWap)
        IcebergWap.fastForwardMain(tdef, path, refName, conf)
        ()
    }
    Seq.empty
  }
}
