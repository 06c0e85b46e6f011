package graft.io

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

/** Maintenance statements for the table format — the public
  * Delta-lake pattern of a DELEGATING parser that owns a few verbs and
  * hands everything else to Spark's own:
  * {{{
  *   OPTIMIZE '/path'                              -- whole-table compaction
  *   OPTIMIZE '/path' RANGE BY k INTO 8 BUCKETS    -- range re-clustering
  *   OPTIMIZE '/path' ZORDER BY (a, b) INTO 8 BUCKETS
  *   OPTIMIZE '/path' SMALL FILES UNDER 1048576    -- bin-pack the small tail
  *   VACUUM '/path' KEEP LAST 3                    -- expire + reclaim
  *   RESTORE '/path' TO VERSION 4                  -- content rollback commit
  *   CLONE '/src' TO '/dst' [VERSION AS OF 4]      -- zero-copy shallow clone
  *   CREATE MATERIALIZED VIEW '/mv' AS             -- standing incremental MV
  *     SELECT k, count(*) AS n, sum(x) AS sx FROM '/src' GROUP BY k
  *   REFRESH MATERIALIZED VIEW '/mv'               -- fold the change feed in
  *   ANALYZE '/path' FOR COLUMNS (a, b)            -- retrofit NDV sketches
  * }}}
  * Each lands through the Scala maintenance verb ([[TableFormat.compact]]
  * / [[TableFormat.compactRanged]] / [[TableFormat.compactZOrder]] /
  * [[TableFormat.compactSmall]] / [[TableFormat.expire]]+[[TableFormat.vacuum]])
  * and returns a one-row summary. The path is quoted (these are
  * path-addressed maintenance verbs, like `graft_snapshot`); only
  * statements whose FIRST token is OPTIMIZE/VACUUM are intercepted, so
  * every standard SQL text — including any that merely contains those
  * words — parses exactly as before. Install with the extensions:
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
final class GraftSqlParser(delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.maintenancePlan(sqlText).getOrElse {
      val p = delegate.parsePlan(sqlText)
      GraftSqlParser.wrapAddColumns(p).getOrElse(p)
    }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

private[graft] object GraftSqlParser {

  private val OptimizePlain =
    """(?is)\s*OPTIMIZE\s+'([^']+)'\s*;?\s*""".r
  private val OptimizeRange =
    """(?is)\s*OPTIMIZE\s+'([^']+)'\s+RANGE\s+BY\s+(\w+)\s+INTO\s+(\d+)\s+BUCKETS\s*;?\s*""".r
  private val OptimizeZOrder =
    """(?is)\s*OPTIMIZE\s+'([^']+)'\s+ZORDER\s+BY\s*\(\s*(\w+)\s*,\s*(\w+)\s*\)\s+INTO\s+(\d+)\s+BUCKETS\s*;?\s*""".r
  private val OptimizeSmall =
    """(?is)\s*OPTIMIZE\s+'([^']+)'\s+SMALL\s+FILES\s+UNDER\s+(\d+)\s*;?\s*""".r
  private val Vacuum =
    """(?is)\s*VACUUM\s+'([^']+)'\s+KEEP\s+LAST\s+(\d+)\s*;?\s*""".r
  private val Restore =
    """(?is)\s*RESTORE\s+'([^']+)'\s+TO\s+VERSION\s+(\d+)\s*;?\s*""".r
  private val Clone =
    """(?is)\s*CLONE\s+'([^']+)'\s+TO\s+'([^']+)'(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*""".r
  // quoted-path form only: Spark's own `ANALYZE TABLE ident …` must
  // keep parsing through the delegate untouched
  private val Analyze =
    """(?is)\s*ANALYZE\s+'([^']+)'\s+FOR\s+COLUMNS\s*\(\s*([\w\s,]+?)\s*\)\s*;?\s*""".r
  private val CreateMv =
    """(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+'([^']+)'\s+AS\s+SELECT\s+(.*?)\s+FROM\s+('[^']+'(?:\s+JOIN\s+'[^']+'\s+ON\s+\w+\s*=\s*\w+)*)(?:\s+WHERE\s+(.+?))?\s+GROUP\s+BY\s+([\w\s,]+?)\s*;?\s*""".r
  private val MvJoinClause =
    """(?is)JOIN\s+'([^']+)'\s+ON\s+(\w+)\s*=\s*(\w+)""".r
  private val MvFromFact = """(?s)^'([^']+)'""".r
  private val RefreshMv =
    """(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+'([^']+)'\s*;?\s*""".r
  private val MvLead =
    """(?is)\s*(?:CREATE|REFRESH)\s+MATERIALIZED\s+VIEW\b.*""".r
  private val Lead = """(?is)\s*(OPTIMIZE|VACUUM|RESTORE|CLONE)\b.*""".r

  /** One SELECT item of a CREATE MATERIALIZED VIEW — either a bare
    * group column or `fn(arg) AS name`. Single-argument aggregates
    * only, so splitting the item list on commas is unambiguous.
    */
  private val AggItem = """(?i)(\w+)\s*\(\s*(\*|[\w.]+)\s*\)\s+AS\s+(\w+)""".r
  private val ColItem = """(\w+)""".r

  private[graft] def parseMvItems(items: String, groupBy: String)
      : (Seq[String], Seq[MvAgg]) = {
    val declaredGroups = groupBy.split(",").map(_.trim).filter(_.nonEmpty)
    val cols = Seq.newBuilder[String]
    val aggs = Seq.newBuilder[MvAgg]
    items.split(",").map(_.trim).filter(_.nonEmpty).foreach {
      case AggItem(fn, arg, out) =>
        val f = fn.toLowerCase
        aggs += (if (f == "count" && arg == "*") MvAgg("count_star", "*", out)
                 else MvAgg(f, arg, out))
      case ColItem(c) => cols += c
      case other => throw new IllegalArgumentException(
        s"malformed MATERIALIZED VIEW select item '$other' — use a " +
          "group column or fn(col) AS name (count/sum/avg/min/max)")
    }
    val g = cols.result()
    require(g.sorted == declaredGroups.toSeq.sorted,
      s"MATERIALIZED VIEW select columns (${g.mkString(", ")}) must " +
        s"match GROUP BY (${declaredGroups.mkString(", ")})")
    (g, aggs.result())
  }

  def maintenancePlan(sql: String): Option[LogicalPlan] = sql match {
    case CreateMv(mv, items, fromClause, whereOrNull, groupBy) =>
      val (g, aggs) = parseMvItems(items, groupBy)
      val fact = MvFromFact.findFirstMatchIn(fromClause).get.group(1)
      val dims = MvJoinClause.findAllMatchIn(fromClause).map(m =>
        MvDim(TableFormat.posixRoot(m.group(1)), m.group(2), m.group(3)))
        .toSeq
      Some(GraftMvCommand(TableFormat.posixRoot(mv), "create",
        source = TableFormat.posixRoot(fact), groupCols = g, aggs = aggs,
        where = Option(whereOrNull).map(_.trim).filter(_.nonEmpty),
        dims = dims))
    case RefreshMv(mv) =>
      Some(GraftMvCommand(TableFormat.posixRoot(mv), "refresh"))
    case MvLead() => throw new IllegalArgumentException(
      "malformed MATERIALIZED VIEW statement — supported forms: " +
        "CREATE MATERIALIZED VIEW '<mv>' AS SELECT <group cols + " +
        "fn(col) AS name…> FROM '<fact>' [JOIN '<dim>' ON fk = pk …] " +
        "[WHERE <pred>] GROUP BY <cols>; " +
        "REFRESH MATERIALIZED VIEW '<mv>'")
    case OptimizePlain(p) =>
      Some(GraftMaintenanceCommand(TableFormat.posixRoot(p), "compact"))
    case OptimizeRange(p, col, n) =>
      Some(GraftMaintenanceCommand(TableFormat.posixRoot(p), "range",
        cols = Seq(col), n = n.toInt))
    case OptimizeZOrder(p, a, b, n) =>
      Some(GraftMaintenanceCommand(TableFormat.posixRoot(p), "zorder",
        cols = Seq(a, b), n = n.toInt))
    case OptimizeSmall(p, bytes) =>
      Some(GraftMaintenanceCommand(TableFormat.posixRoot(p), "small",
        n = 2, bytes = bytes.toLong))
    case Vacuum(p, keep) =>
      Some(GraftMaintenanceCommand(TableFormat.posixRoot(p), "vacuum",
        n = keep.toInt))
    case Restore(p, v) =>
      Some(GraftMaintenanceCommand(TableFormat.posixRoot(p), "restore",
        n = v.toInt))
    case Clone(src, dst, v) =>
      Some(GraftMaintenanceCommand(TableFormat.posixRoot(src), "clone",
        cols = Seq(TableFormat.posixRoot(dst)),
        n = Option(v).map(_.toInt).getOrElse(-1)))
    case Analyze(p, colList) =>
      Some(GraftMaintenanceCommand(TableFormat.posixRoot(p), "analyze",
        cols = colList.split(",").map(_.trim).filter(_.nonEmpty).toSeq))
    case Lead(verb) => throw new IllegalArgumentException(
      s"malformed graft $verb statement — supported forms: " +
        "OPTIMIZE '<path>' [RANGE BY col INTO n BUCKETS | ZORDER BY " +
        "(a, b) INTO n BUCKETS | SMALL FILES UNDER bytes]; " +
        "VACUUM '<path>' KEEP LAST n; RESTORE '<path>' TO VERSION n; " +
        "CLONE '<src>' TO '<dst>' [VERSION AS OF n]")
    case _ => None
  }

  /** `ALTER TABLE t ADD COLUMNS (…)` — Spark refuses it outright for
    * unlisted v1 providers ("drop and re-create the table"), so the
    * parser wraps the SIMPLE shape (session-catalog identifier,
    * top-level columns, no FIRST/AFTER position, no DEFAULT) into a
    * command that dispatches at RUN time: a graft table evolves by a
    * schema-only widening commit (entries verbatim, metadata-only —
    * old rows read null, time travel keeps the narrow schema) plus the
    * catalog realign; any other table lands through Spark's own v1
    * `AlterTableAddColumnsCommand`, keeping its behavior — including
    * its refusals — intact. Nested adds, positions, defaults, and
    * foreign-catalog identifiers stay on the untouched standard plan.
    */
  private[graft] def wrapAddColumns(p: LogicalPlan): Option[LogicalPlan] =
    p match {
      case a: org.apache.spark.sql.catalyst.plans.logical.AddColumns =>
        a.table match {
          case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
            val ident = u.multipartIdentifier match {
              case Seq(t) => Some(TableIdentifier(t))
              case Seq(db, t) => Some(TableIdentifier(t, Some(db)))
              case Seq(cat, db, t)
                  if cat.equalsIgnoreCase("spark_catalog") =>
                Some(TableIdentifier(t, Some(db)))
              case _ => None
            }
            val simple = a.columnsToAdd.forall(c =>
              c.path.isEmpty && c.position.isEmpty && c.default.isEmpty)
            ident.filter(_ => simple).map(id =>
              GraftAddColumnsCommand(id,
                a.columnsToAdd.map(c => (c.colName, c.dataType, c.nullable))))
          case _ => None
        }
      case _ => None
    }
}

/** The landed half of ALTER TABLE ADD COLUMNS: graft tables widen the
  * MANIFEST first (one metadata-only commit — the same union-schema
  * contract every rewrite keeps, so a concurrent reader never sees the
  * catalog ahead of the format) and then realign the catalog's
  * declared schema; everything else delegates to Spark's own command.
  */
private[graft] case class GraftAddColumnsCommand(ident: TableIdentifier,
    cols: Seq[(String, DataType, Boolean)]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val catalog = spark.sessionState.catalog
    val meta =
      if (catalog.tableExists(ident)) Some(catalog.getTableMetadata(ident))
      else None
    val graftProviders = Set(
      classOf[TableFormatSourceProvider].getName, "graft-table")
    val isGraft = meta.exists(_.provider.exists(graftProviders))
    if (!isGraft) {
      // not ours: Spark's own v1 path, refusals and all
      org.apache.spark.sql.execution.command.AlterTableAddColumnsCommand(
        ident, cols.map { case (n, t, nl) =>
          org.apache.spark.sql.types.StructField(n, t, nl) }).run(spark)
      return Seq.empty
    }
    val ct = meta.get
    require(cols.forall(_._3),
      s"graft-table ADD COLUMNS must be nullable — existing rows have " +
        "no value to backfill (NOT NULL would be violated immediately)")
    val newFields = cols.map { case (n, t, _) =>
      org.apache.spark.sql.types.StructField(n, t, nullable = true) }
    val raw = ct.storage.properties.get("path")
      .orElse(ct.storage.properties.get("Path"))
      .orElse(ct.storage.locationUri.map(_.toString))
      .getOrElse(throw new IllegalArgumentException(
        s"graft table $ident has no path/location"))
    val root = TableFormat.posixRoot(raw)
    // manifest first (a declared-but-empty table has no manifest yet —
    // the catalog alone governs until the first insert commits v0)
    TableFormat.addColumns(spark, root, newFields)
    catalog.alterTableDataSchema(ident,
      StructType(ct.dataSchema.fields ++ newFields))
    spark.catalog.refreshTable(ident.quotedString)
    Seq.empty
  }
}

/** CREATE/REFRESH MATERIALIZED VIEW → a one-row summary. Lands through
  * [[MatView.create]]/[[MatView.refresh]]; reads go through the
  * `graft_mv('<mv>')` table function.
  */
private[graft] case class GraftMvCommand(mvRoot: String, verb: String,
    source: String = "", groupCols: Seq[String] = Nil,
    aggs: Seq[MvAgg] = Nil, where: Option[String] = None,
    dims: Seq[MvDim] = Nil) extends LeafRunnableCommand {

  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.StringType

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("operation", StringType, nullable = false)(),
      AttributeReference("result", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val result = verb match {
      case "create" =>
        s"v${MatView.create(spark, mvRoot, source, groupCols, aggs,
          where, dims)}"
      case "refresh" =>
        s"v${MatView.refresh(spark, mvRoot)}"
      case other => throw new IllegalStateException(s"verb $other")
    }
    Seq(Row(s"$verb materialized view", result))
  }
}

/** One maintenance run → a one-row (operation, version, detail)
  * summary. Kept as a single command class: the verbs share the
  * root/commit plumbing and differ only in which [[TableFormat]]
  * maintenance call they land.
  */
private[graft] case class GraftMaintenanceCommand(root: String,
    verb: String, cols: Seq[String] = Nil, n: Int = 0,
    bytes: Long = 0L) extends LeafRunnableCommand {

  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.StringType

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("operation", StringType, nullable = false)(),
      AttributeReference("result", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val result = verb match {
      case "compact" =>
        s"v${TableFormat.compact(spark, root)}"
      case "range" =>
        s"v${TableFormat.compactRanged(spark, root, cols.head, n)}"
      case "zorder" =>
        s"v${TableFormat.compactZOrder(spark, root, cols.head, cols(1), n)}"
      case "small" =>
        val v = TableFormat.compactSmall(spark, root, bytes, minDirs = n)
        s"v$v"
      case "vacuum" =>
        val expired = TableFormat.expire(root, keepLast = n)
        val dirs = TableFormat.vacuum(root)
        s"expired ${expired.size} version(s), reclaimed ${dirs.size} dir(s)"
      case "restore" =>
        s"v${TableFormat.restore(root, n)}"
      case "clone" => // cols.head carries the DESTINATION path here
        s"v${TableFormat.cloneTable(root, cols.head, version = n)} " +
          s"at ${cols.head}"
      case "analyze" =>
        s"v${TableFormat.analyze(spark, root, cols)}"
      case other => throw new IllegalStateException(s"verb $other")
    }
    Seq(Row(verb, result))
  }
}
