package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, Not}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter,
  LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

import graft.lake.{DvRowDeleted, LakeLog, PathMapPayload}
import graft.sources.{DvParquetFileFormat, LakeFileIndex}

/** Metadata-only `COUNT(*)` (Delta's OptimizeMetadataOnlyQuery
  * analog): an unfiltered scalar count over a lake relation is
  * answered from the transaction log — Σ numRecords − Σ dvCardinality
  * over the snapshot's AddFiles — instead of scanning the table. At
  * 100 TB that turns the most common sanity query there is from a
  * full-table scan into a driver-side metadata fold the snapshot has
  * already paid for.
  *
  * Strictly guarded, bail-to-scan on anything uncertain:
  *  - exactly one aggregate, `count(non-null literal)` (what
  *    `count(*)`/`count(1)` analyze to), not DISTINCT, no FILTER
  *    clause, no grouping;
  *  - nothing between the aggregate and the relation but
  *    deterministic projections (they cannot change cardinality) and
  *    AT MOST the engine's own deletion-vector filter
  *    (`Not(DvRowDeleted(...))` — the shape `LakeTable.toDF` attaches
  *    on DV-carrying snapshots), verified against the snapshot's own
  *    file→DV map before it is trusted;
  *  - DELETION VECTORS must be accounted exactly once: the rewrite
  *    fires only when the snapshot has no DVs, or the scan nets them
  *    ([[DvParquetFileFormat]] — the format("lake") path), or the
  *    verified DV filter sits above a raw relation (the toDF path).
  *    A RAW relation over a DV snapshot (internal DML frames) counts
  *    physical rows and must NOT be answered with the live count;
  *  - every AddFile carries a footer row count (converted/foreign
  *    files may not — then the scan is the only truth).
  */
object MetadataOnlyCount extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(
        Seq(), Seq(a @ Alias(ae: AggregateExpression, _)), child, _)
        if isCountStar(ae) =>
      liveRowsBelow(child) match {
        case Some(live) =>
          LocalRelation(Seq(a.toAttribute), Seq(InternalRow(live)))
        case None => agg
      }
  }

  private def isCountStar(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case Count(Seq(Literal(v, _))) => v != null
      case _ => false
    })

  /** The log-derived live row count, when the plan below the count is
    * provably the full table: deterministic projections over either a
    * DV-netting scan or the engine's own verified DV filter over a
    * raw scan. None = bail to the scan.
    */
  private def liveRowsBelow(p: LogicalPlan): Option[Long] = p match {
    case Project(projectList, child)
        if projectList.forall(_.deterministic) =>
      liveRowsBelow(child)
    case Filter(Not(dv: DvRowDeleted), child) =>
      relationBelow(child).collect {
        case (idx, _) if allCounted(idx) && dvMapMatches(dv, idx) =>
          liveRows(idx)
      }
    case other =>
      relationBelow(other).collect {
        case (idx, dvInScan) if allCounted(idx) &&
            (dvInScan || !idx.snap.files.exists(_.dvPath.isDefined)) =>
          liveRows(idx)
      }
  }

  /** (lake index, whether the scan itself nets deletion vectors). */
  private def relationBelow(
      p: LogicalPlan): Option[(LakeFileIndex, Boolean)] = p match {
    case Project(projectList, child)
        if projectList.forall(_.deterministic) =>
      relationBelow(child)
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation => h.location match {
        case idx: LakeFileIndex =>
          Some((idx, h.fileFormat.isInstanceOf[DvParquetFileFormat]))
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  private def allCounted(idx: LakeFileIndex): Boolean =
    idx.snap.files.forall(_.numRecords >= 0L)

  private def liveRows(idx: LakeFileIndex): Long =
    idx.snap.files.map(f => f.numRecords - f.dvCardinality).sum

  /** The DV filter is trusted only if its file→DV map is exactly the
    * one this snapshot would build — a handcrafted DvRowDeleted over
    * a different table must not let the rewrite misattribute counts.
    */
  private def dvMapMatches(dv: DvRowDeleted, idx: LakeFileIndex): Boolean =
    try {
      val bytes = dv.third.eval(null).asInstanceOf[Array[Byte]]
      val decoded = PathMapPayload.decodePayload(bytes)
      val tablePath = idx.snap.log.tablePath
      val expected = idx.snap.files.filter(_.dvPath.isDefined).map { f =>
        (LakeLog.resolveFile(tablePath, f.path).toString,
          LakeLog.resolveFile(tablePath, f.dvPath.get).toString)
      }.toMap
      decoded.size == expected.size && expected.forall {
        case (k, v) => decoded.get(k) == v
      }
    } catch { case _: Exception => false }
}
