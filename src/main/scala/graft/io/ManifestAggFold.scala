package graft.io

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DateType, IntegerType, LongType}

/** Metadata-only aggregates over the table format's SQL surface — the
  * public Delta/Iceberg idea of answering bare `count(*)`/`min`/`max`
  * (and, r16, `approx_count_distinct` from the manifest's NDV sketch
  * registers — see [[NdvSketch]] and the rsd gate at the match site)
  * from the commit log's accounts instead of scheduling a scan. An
  * unfiltered, ungrouped aggregate over a [[ManifestFileIndex]]-backed
  * relation whose every output folds — counts from the manifest row
  * tally, extremes from the typed zone maps — collapses to a
  * [[LocalRelation]]: ZERO Spark jobs, zero listings, zero footer
  * opens. At 100 TB this is the difference between a KB of driver-side
  * metadata and one task per file re-adding row-group stats Spark
  * would read from the same footers anyway.
  *
  * Soundness gates, all mandatory:
  *  - grouping must be empty, and EVERY output must fold — one
  *    unfoldable aggregate keeps the whole query on the scan path;
  *  - `count(<non-null literal>)` (what `COUNT(*)` and
  *    `Dataset.count()` both resolve to) — never DISTINCT, never a
  *    FILTER clause — needs a complete row account
  *    ([[ManifestFileIndex.metadataRowCount]]);
  *  - `min(col)`/`max(col)` need EVERY entry to carry zone-map bounds
  *    for the column in a domain where the parquet footer stats are
  *    exact values of the data — long/int/date. Strings decline
  *    (writers may truncate binary stats), as do float/decimal/
  *    timestamp (bounds aren't recorded for them at all). A missing
  *    per-entry bound is indistinguishable from an unstatted column,
  *    so any gap declines — an all-null dir legitimately has no
  *    bounds, and folding around it would need that distinction;
  *  - the child may only be Project nodes over the relation (a Project
  *    never changes cardinality; a Filter always may, so any filter
  *    shape — even one the manifest could prove empty — declines);
  *    aliases are resolved through the Project chain so
  *    `min(x)` over `SELECT k AS x FROM t` folds off k's bounds;
  *  - no entry may carry a deletion vector (a dv can hide the extreme
  *    row, and its sidecar may name keys that never existed, so
  *    neither counts nor extremes survive arithmetic on it).
  *
  * On an EMPTY table (zero entries) counts fold to 0 and extremes to
  * NULL — the same one-row shape the scan would produce.
  *
  * Registered by [[graft.GraftExtensions]]; plan-pinned (no scan node,
  * no exchange) and value-checked in `TableFormatSqlSpec`.
  */
object ManifestAggFold extends Rule[LogicalPlan] {

  /** The manifest index, if `p` is (Projects over) a manifest-backed
    * relation; alias resolution happens separately per attribute.
    */
  private def relationIndex(p: LogicalPlan): Option[ManifestFileIndex] =
    p match {
      case Project(_, child) => relationIndex(child)
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location match {
          case m: ManifestFileIndex => Some(m)
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }

  /** Resolve `a` through the Project chain to the RELATION's own
    * attribute (following aliases of bare column references); None for
    * any computed expression — its extremes aren't the column's.
    */
  private def resolveAttr(p: LogicalPlan, a: Attribute): Option[Attribute] =
    p match {
      case Project(list, child) => list.find(_.exprId == a.exprId) match {
        case Some(al: Alias) => al.child match {
          case ar: AttributeReference => resolveAttr(child, ar)
          case _ => None
        }
        case Some(ar: AttributeReference) => resolveAttr(child, ar)
        case None => None
      }
      case l: LogicalRelation => l.output.find(_.exprId == a.exprId)
      case _ => None
    }

  /** The folded internal-row value of one output, or None to decline.
    * Values are in Catalyst internal form for the attribute's type
    * (long, int, or date-days int).
    */
  private def foldValue(plan: LogicalPlan, m: ManifestFileIndex,
      e: NamedExpression): Option[Any] = e match {
    case Alias(ae: AggregateExpression, _)
        if !ae.isDistinct && ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case Count(Seq(Literal(v, _))) if v != null =>
          m.metadataRowCount.map(n => n: Any)
        // count(col) = Σ rows − Σ nulls (r18): needs every entry
        // dv-free with a row account AND a recorded null count for the
        // resolved column (the commit's footer pass records them for
        // the declared stats columns)
        case Count(Seq(a: AttributeReference)) =>
          nonNullCount(plan, m, a)
        case Min(a: AttributeReference) =>
          extreme(plan, m, a, takeMin = true)
        case Max(a: AttributeReference) =>
          extreme(plan, m, a, takeMin = false)
        // approx_count_distinct: an APPROXIMATE contract, so the fold
        // may answer from the manifest's NDV sketches — but only when
        // the caller's requested error tolerates the sketch's (rsd ≥
        // the registers' 4.6 %); a tighter ask stays on the scan. The
        // folded estimate is deterministic (fixed-seed xxhash64
        // registers), unlike a sampled one — same data, same answer.
        case h: HyperLogLogPlusPlus
            if h.relativeSD >= NdvSketch.Rsd - 1e-12 =>
          h.child match {
            case a: AttributeReference => ndvFold(plan, m, a)
            case _ => None
          }
        case _ => None
      }
    case _ => None
  }

  /** NDV of `a` from the manifest sketches: every entry dv-free (a dv
    * can hide distinct values) and sketch-carrying for the resolved
    * column; a gap — a dir landed or rewritten since the last ANALYZE —
    * declines, like an unbounded column does for extremes.
    */
  private def ndvFold(plan: LogicalPlan, m: ManifestFileIndex,
      a: AttributeReference): Option[Any] =
    resolveAttr(plan, a).flatMap { col =>
      if (m.entries.isEmpty) Some(0L)
      else if (m.entries.forall(e => e.dv.isEmpty &&
          e.ndv.get(col.name).exists(NdvSketch.isCurrent)))
        Some(NdvSketch.estimate(m.entries
          .map(e => NdvSketch.fromHex(e.ndv(col.name)))
          .reduce(NdvSketch.merge)))
      else None
    }

  /** Non-null count of `a` from the manifest null accounts: every
    * entry dv-free (a dv can hide null or non-null rows alike), row
    * account present, and a null count recorded for the resolved
    * column; any gap declines — an unrecorded column is
    * indistinguishable from an unknown tally.
    */
  private def nonNullCount(plan: LogicalPlan, m: ManifestFileIndex,
      a: AttributeReference): Option[Any] =
    resolveAttr(plan, a).flatMap { col =>
      if (m.entries.isEmpty) Some(0L)
      else if (m.entries.forall(e => e.dv.isEmpty && e.rows >= 0 &&
          e.nulls.contains(col.name)))
        Some(m.entries.map(e => e.rows - e.nulls(col.name)).sum: Any)
      else None
    }

  /** min/max of `a` from the zone maps: every entry dv-free and
    * bounded on the resolved column in an exact domain, the column's
    * Catalyst type in that domain. Some(null) = foldable empty table.
    */
  private def extreme(plan: LogicalPlan, m: ManifestFileIndex,
      a: AttributeReference, takeMin: Boolean): Option[Any] = {
    val exact = (a.dataType == LongType || a.dataType == IntegerType ||
      a.dataType == DateType)
    if (!exact) return None
    resolveAttr(plan, a).flatMap { col =>
      val wantKind = if (a.dataType == DateType) "date" else "long"
      if (m.entries.isEmpty) Some(null) // min/max over empty = NULL
      else if (m.entries.forall(e => e.dv.isEmpty &&
          e.bounds.get(col.name).exists(_.typ == wantKind))) {
        val vs = m.entries.map { e =>
          val b = e.bounds(col.name)
          (if (takeMin) b.lo else b.hi).toLong
        }
        val v = if (takeMin) vs.min else vs.max
        Some(a.dataType match {
          case LongType => v
          case _ => v.toInt // IntegerType and DateType (epoch days)
        })
      } else None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate
        if agg.groupingExpressions.isEmpty &&
          agg.aggregateExpressions.nonEmpty =>
      relationIndex(agg.child) match {
        case Some(m) =>
          val vals = agg.aggregateExpressions
            .map(e => foldValue(agg.child, m, e))
          if (vals.forall(_.isDefined))
            LocalRelation(agg.output,
              Seq(InternalRow.fromSeq(vals.map(_.get))))
          else agg
        case None => agg
      }
  }
}
