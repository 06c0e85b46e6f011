package graft.io

import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DateType, IntegerType, LongType}

/** Feed the optimizer's COST MODEL from the manifest — the missing half
  * of `ANALYZE TABLE`: a manifest-backed relation already KNOWS its row
  * count (size accounts), per-column NDV (sketch registers), and
  * per-column min/max (zone maps), so a pre-CBO rule attaches them as
  * the relation's [[CatalogStatistics]] and Spark's own join-reorder /
  * join-selection cardinality estimation runs off true numbers — zero
  * `ANALYZE TABLE` scans, fresh at every commit because the stats ARE
  * the commit metadata. At 100 TB this is the difference between CBO
  * being unusable (a stats scan per table per change) and free.
  *
  * Gates, all sound-first like every other manifest consumer:
  *   - a relation that already carries catalog stats (a real ANALYZEd
  *     catalog table) is left alone — measured beats derived;
  *   - row count only when every entry has an account and none is
  *     dv-masked ([[ManifestFileIndex.metadataRowCount]]'s contract);
  *   - per-column NDV only when every entry is dv-free and carries a
  *     sketch for the column; min/max only from complete bounds in the
  *     column's own domain — integral columns off long bounds, date
  *     columns off epoch-day bounds rendered in the catalog's ISO
  *     external form (round-trip spec-pinned); strings decline (footer
  *     stats may be truncated).
  *   - estimates feed PLANNING only — no correctness path reads them.
  *
  * Registered via `injectPreCBORule` ([[graft.GraftExtensions]]) so it
  * runs after operator optimization and BEFORE the cost-based
  * join-reorder batch that consumes the stats; effective when the user
  * enables `spark.sql.cbo.enabled` (+ `joinReorder.enabled`), inert
  * otherwise — exactly `ANALYZE TABLE`'s own contract.
  */
object GraftManifestStats extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case l: LogicalRelation if l.catalogTable.forall(_.stats.isEmpty) =>
      l.relation match {
        case fs: HadoopFsRelation => fs.location match {
          case m: ManifestFileIndex =>
            val ct = l.catalogTable.getOrElse(synthetic(l, m))
            l.copy(catalogTable = Some(ct.copy(stats = Some(statsOf(l, m)))))
          case _ => l
        }
        case _ => l
      }
  }

  /** A placeholder CatalogTable for path-addressed relations (TVF /
    * registerSql / `spark.read.format(…)`) — only its `stats` slot is
    * consumed (LogicalRelation.computeStats); the identifier is
    * synthetic and never reaches a catalog.
    */
  private def synthetic(l: LogicalRelation, m: ManifestFileIndex)
      : CatalogTable =
    CatalogTable(
      identifier = TableIdentifier(
        "graft_manifest_stats_" + Integer.toHexString(m.root.hashCode)),
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty,
      schema = l.relation.schema,
      provider = Some("graft-table"))

  private def statsOf(l: LogicalRelation,
      m: ManifestFileIndex): CatalogStatistics = {
    val clean = m.entries.forall(_.dv.isEmpty)
    val colStats = l.output.flatMap { a =>
      val ndv: Option[BigInt] =
        if (m.entries.isEmpty) Some(BigInt(0))
        else if (clean && m.entries.forall(
            _.ndv.get(a.name).exists(NdvSketch.isCurrent)))
          Some(BigInt(NdvSketch.estimate(m.entries
            .map(e => NdvSketch.fromHex(e.ndv(a.name)))
            .reduce(NdvSketch.merge))))
        else None
      val integral =
        a.dataType == LongType || a.dataType == IntegerType
      val (lo, hi): (Option[String], Option[String]) =
        if (integral && m.entries.nonEmpty && m.entries.forall(
            _.bounds.get(a.name).exists(_.typ == "long"))) {
          val bs = m.entries.map(_.bounds(a.name))
          (Some(bs.map(_.lo.toLong).min.toString),
            Some(bs.map(_.hi.toLong).max.toString))
        } else if (a.dataType == DateType && m.entries.nonEmpty &&
            m.entries.forall(
              _.bounds.get(a.name).exists(_.typ == "date"))) {
          // zone maps hold epoch days; the catalog's external form is
          // the ISO date string (CatalogColumnStat.fromExternalString
          // parses it back to days) — round-trip spec-pinned
          val bs = m.entries.map(_.bounds(a.name))
          (Some(java.time.LocalDate.ofEpochDay(bs.map(_.lo.toLong).min)
            .toString),
            Some(java.time.LocalDate.ofEpochDay(bs.map(_.hi.toLong).max)
              .toString))
        } else (None, None)
      // null accounts (r18): sharpens IS [NOT] NULL selectivity and
      // join-cardinality estimates; complete-or-decline like the rest.
      // nullCount only RIDES on a stat ndv/bounds already justify — a
      // nullCount-ONLY ColumnStat makes `colStatsMap.contains` true
      // and steers Spark's FilterEstimation into
      // evaluateBinaryForNumeric without min/max, an INTERNAL_ERROR
      // (found by q_tpch_q5_cbo's timestamp range filter)
      val nulls: Option[BigInt] =
        if (m.entries.isEmpty) Some(BigInt(0))
        else if (clean && m.entries.forall(_.nulls.contains(a.name)))
          Some(BigInt(m.entries.map(_.nulls(a.name)).sum))
        else None
      // equi-height HISTOGRAM (r19): merged from the per-entry log-bin
      // counts when every live entry carries one for the column — the
      // skewed-predicate selectivity lever min/max uniformity lacks.
      // Rides only on a stat ndv/bounds already justify, like nullCount.
      // the hist slot carries NUMERIC log-bin histograms and (r20)
      // STRING frequency summaries; only the numeric encoding converts
      // to Spark's equi-height form — the string summaries feed
      // [[GraftFrequencyHints]], which Spark's Histogram cannot carry
      val histogram =
        if (m.entries.nonEmpty && clean &&
            m.entries.forall(_.hist.get(a.name)
              .exists(h => !FreqSketch.isFreq(h))))
          QuantileHist.toEquiHeight(
            m.entries.map(e => QuantileHist.decode(e.hist(a.name)))
              .reduce(QuantileHist.merge),
            ndv = ndv.map(_.toLong))
        else None
      if (ndv.isEmpty && lo.isEmpty) None
      else Some(a.name -> CatalogColumnStat(distinctCount = ndv,
        min = lo, max = hi, nullCount = nulls, avgLen = None,
        maxLen = None, histogram = histogram))
    }.toMap
    CatalogStatistics(
      sizeInBytes = BigInt(m.sizeInBytes),
      rowCount = m.metadataRowCount.map(BigInt(_)),
      colStats = colStats)
  }
}
