package graft.io

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** SQL DML over the table format: an `INSERT INTO` / `INSERT OVERWRITE`
  * whose target resolves to a [[ManifestFileIndex]]-backed relation is
  * rewritten into a manifest COMMIT ([[TableFormat.append]] /
  * [[TableFormat.replace]]) — the public Delta-lake pattern of
  * intercepting the insert at resolution time. This rule is mandatory
  * for correctness, not a convenience: without it Spark's own
  * `DataSourceAnalysis` (a post-hoc rule — injected resolution rules
  * run first) classifies the relation by its `HadoopFsRelation` shape
  * and plans a raw file write into the table ROOT — parquet landing
  * outside any commit, invisible to every snapshot, stranded from
  * vacuum. With the rule, the full SQL lifecycle works against the
  * registered provider:
  * {{{
  *   CREATE TABLE t USING `graft…Provider` OPTIONS (path '…')  -- register
  *   CREATE TABLE t USING … AS SELECT …                        -- CTAS (writer path)
  *   INSERT INTO t SELECT … / VALUES …                         -- append commit
  *   INSERT INTO t (b, a) VALUES …         -- column list, absent → NULL
  *   INSERT OVERWRITE t SELECT …                               -- replace commit
  * }}}
  * Rows align to the table schema by POSITION (the SQL default), by
  * NAME under `byName`/an explicit column list (absent columns
  * null-fill), with casts to the declared field types — resolved here,
  * while the analyzer still owns the plan. The commit records the zone
  * maps/blooms the table was DECLARED with (`statsCols`/`bloomCol`
  * options ride on the relation's file index), so SQL-inserted data
  * prunes like Scala-landed data. PARTITION specs refuse: layout is
  * the manifest's concern (compactRanged/compactZOrder).
  *
  * A dv-bearing head refuses upstream (the one-relation read contract
  * in [[TableFormat.manifestRelation]]), so an insert can never race
  * its own target's masked rows. Registered by
  * [[graft.GraftExtensions]]; spec'd in `TableFormatSqlSpec`.
  */
final class GraftInsertRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case i: InsertIntoStatement if i.query.resolved =>
        i.table match {
          case l: LogicalRelation => l.relation match {
            case fs: HadoopFsRelation => fs.location match {
              case m: ManifestFileIndex => rewrite(i, l, fs, m)
              case _ => i
            }
            case _ => i
          }
          case _ => i
        }
    }

  private def rewrite(i: InsertIntoStatement, l: LogicalRelation,
      fs: HadoopFsRelation, m: ManifestFileIndex): LogicalPlan = {
    require(i.partitionSpec.isEmpty,
      "graft-table insert does not take a PARTITION spec — the " +
        "table's layout is the manifest's concern " +
        "(compactRanged/compactZOrder)")
    val fields = fs.dataSchema.fields.toSeq
    val out = i.query.output
    val tz = Option(conf.sessionLocalTimeZone)
    def fit(e: NamedExpression,
        f: org.apache.spark.sql.types.StructField): NamedExpression =
      if (e.dataType == f.dataType && e.name == f.name) e
      else if (e.dataType == f.dataType) Alias(e, f.name)()
      else Alias(Cast(e, f.dataType, tz), f.name)()
    val projected: Seq[NamedExpression] =
      if (i.userSpecifiedCols.nonEmpty) {
        require(i.userSpecifiedCols.length == out.length,
          s"INSERT column list names ${i.userSpecifiedCols.length} " +
            s"columns but the query produces ${out.length}")
        val dup = i.userSpecifiedCols.groupBy(_.toLowerCase)
          .collectFirst { case (n, vs) if vs.length > 1 => n }
        require(dup.isEmpty, s"INSERT column list repeats '${dup.get}'")
        val known = fields.map(_.name.toLowerCase).toSet
        val unknown = i.userSpecifiedCols.filterNot(c =>
          known(c.toLowerCase))
        require(unknown.isEmpty,
          s"INSERT column list names ${unknown.mkString(", ")} which " +
            s"the table does not have (${fields.map(_.name).mkString(", ")})")
        val byCol = i.userSpecifiedCols.map(_.toLowerCase).zip(out).toMap
        fields.map { f =>
          byCol.get(f.name.toLowerCase) match {
            case Some(a) => fit(a, f)
            case None => Alias(Literal(null, f.dataType), f.name)()
          }
        }
      } else if (i.byName) {
        val byCol = out.map(a => a.name.toLowerCase -> a).toMap
        fields.map { f =>
          byCol.get(f.name.toLowerCase) match {
            case Some(a) => fit(a, f)
            case None => throw new IllegalArgumentException(
              s"INSERT BY NAME is missing table column '${f.name}'")
          }
        }
      } else {
        require(out.length == fields.length,
          s"INSERT produces ${out.length} columns but the table has " +
            s"${fields.length} (${fields.map(_.name).mkString(", ")})")
        fields.zip(out).map { case (f, a) => fit(a, f) }
      }
    InsertIntoGraftTableCommand(m.root, m.writeOpts,
      Project(projected, i.query), i.overwrite,
      l.catalogTable.map(_.identifier))
  }
}

/** The landed half: run the aligned query and commit it — one
  * [[TableFormat.append]] (INSERT INTO) or [[TableFormat.replace]]
  * (INSERT OVERWRITE — history intact under time travel, whole-table
  * conflict footprint). Carries the query as a resolved plan and
  * executes it through the bridge, the same shape as Spark's own v1
  * `InsertIntoDataSourceCommand`.
  */
private[graft] case class InsertIntoGraftTableCommand(root: String,
    writeOpts: Map[String, String], query: LogicalPlan,
    overwrite: Boolean,
    catalogIdent: Option[org.apache.spark.sql.catalyst.TableIdentifier])
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    val df = org.apache.spark.sql.graftbridge.ColumnBridge
      .ofRows(spark, query)
    val statsCols = writeOpts.get("statscols")
      .orElse(writeOpts.get("statsCols"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val bloomCol = writeOpts.get("bloomcol")
      .orElse(writeOpts.get("bloomCol"))
    if (overwrite)
      TableFormat.replace(spark, root, df, statsCols = statsCols,
        bloomCol = bloomCol)
    else
      TableFormat.append(df, root, statsCols = statsCols,
        bloomCol = bloomCol)
    // a catalog table's resolved relation is CACHED per name
    // (FindDataSourceTable); the commit moved the head, so the next
    // SELECT must re-resolve against the new manifest — the same
    // refresh InsertIntoHadoopFsRelationCommand performs. (A TEMP VIEW
    // created via USING pins its analyzed snapshot by design — re-run
    // registerSql/CREATE to follow the head, exactly like time travel.)
    catalogIdent.foreach(id => spark.catalog.refreshTable(id.quotedString))
    Seq.empty
  }
}
